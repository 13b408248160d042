package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.operators.Similarity
import graft.sources.Tables

/** Multimodal operators registered over the synthetic media table derived
  * from `documents` (§2.10).
  *
  * ALL media rows are REAL containers: the image payload is an actual PNG
  * whose width/height/channels/mean come from `javax.imageio`-decoded
  * pixels, the audio payload is an actual RIFF/WAV whose rate/channels/
  * frames/mean-amplitude come from `javax.sound.sampled`-decoded PCM, and
  * the video payload is an actual RIFF/AVI with uncompressed DIB frames
  * whose width/height/bit-depth/frame-count/mean come from the in-repo
  * spec-conformant container parse ([[graft.multimodal.Avi]]). The oracle
  * verifies all three exactly: fixtures are id-derived (solid-fill dims/
  * color for images, an arithmetic waveform for audio, solid-fill frames
  * for video), and the writers make even the payload byte LENGTHS
  * arithmetic in the id (Png/Wav/Avi `encodedLength`).
  */
object MultimodalQueries {

  private def media(s: SparkSession, d: String) =
    MultimodalOps.mediaFromDocuments(Tables.documents(s, d))

  // id-derived image params, mirrored from MultimodalOps.imageParams:
  // W ∈ [1,31], H ∈ [1,17] keep raw = H*(3W+1) under one deflate block
  private val imgW = "((doc_id % 31) + 1)"
  private val imgH = "((doc_id % 17) + 1)"
  /** Png.encodedLength for a one-block image: 68 + raw. */
  private val imgLen = s"(68 + $imgH * (3 * $imgW + 1))"
  private val imgMean =
    "(((doc_id % 256) + (doc_id * 7 % 256) + (doc_id * 13 % 256)) // 3)"
  // id-derived audio params, mirrored from MultimodalOps.audioNumSamples/
  // audioSample: n samples, 16-bit mono, mean |amplitude|
  private val audN = "((doc_id % 400) + 50)"
  /** Wav.encodedLength: canonical 44-byte header + 2 bytes per sample. */
  private val audLen = s"(44 + 2 * $audN)"
  private val audMean =
    s"(list_sum([abs((doc_id * 31 + i * 7) % 2001 - 1000) for i in range(0, $audN)]) // $audN)"
  // id-derived video params, mirrored from MultimodalOps.videoParams /
  // videoFrameFill: even width, height, frame count, solid fill per frame
  private val vidW = "(((doc_id % 16) + 1) * 2)"
  private val vidH = "((doc_id % 9) + 2)"
  private val vidN = "((doc_id % 24) + 2)"
  /** Avi.encodedLength: 224-byte container skeleton + framed DIB chunks. */
  private val vidLen = s"(224 + $vidN * (8 + $vidW * $vidH * 3))"
  // mean over all frame pixel bytes; every byte of frame f equals the fill,
  // so the grand mean reduces to floor(sum(fills)/nFrames)
  private val vidMean =
    s"(list_sum([(doc_id * 31 + f * 7) % 256 for f in range(0, $vidN)]) // $vidN)"
  /** Payload length per kind: PNG for images, WAV for audio, AVI for
    * video — all exact container arithmetic. */
  private val payloadLen =
    s"""CASE WHEN doc_id % 3 = 0 THEN $imgLen
       |       WHEN doc_id % 3 = 1 THEN $audLen
       |       ELSE $vidLen END""".stripMargin

  private def q26MediaMeta(s: SparkSession, d: String): DataFrame =
    MultimodalOps.decodeMeta(media(s, d)).toDF()

  private val q26Sql =
    s"""SELECT doc_id AS media_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'image'
       |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |  CAST($payloadLen AS INTEGER) AS n_bytes,
       |  CAST(CASE WHEN doc_id % 3 = 0 THEN $imgW
       |       WHEN doc_id % 3 = 1 THEN $audN
       |       ELSE $vidW END AS INTEGER) AS width,
       |  CAST(CASE WHEN doc_id % 3 = 0 THEN $imgH
       |       WHEN doc_id % 3 = 1 THEN 1
       |       ELSE $vidH END AS INTEGER) AS height,
       |  CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS INTEGER) AS channels,
       |  CAST(CASE WHEN doc_id % 3 = 0 THEN $imgMean
       |       WHEN doc_id % 3 = 1 THEN $audMean
       |       ELSE $vidMean END AS BIGINT) AS mean_code
       |FROM documents""".stripMargin

  private def q27FrameSample(s: SparkSession, d: String): DataFrame =
    MultimodalOps.sampleFrames(media(s, d), everyN = 2).toDF()

  // every 2nd REAL movi frame chunk; chunk size = w*h*3 (24-bit DIB)
  private val q27Sql =
    s"""WITH v AS (
      |  SELECT doc_id AS media_id, $vidW AS w, $vidH AS h,
      |    CAST($vidN AS BIGINT) AS nf
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT media_id, CAST(idx AS INTEGER) AS frame_idx,
      |  CAST(w * h * 3 AS INTEGER) AS n_bytes
      |FROM v, unnest(range(0, nf, 2)) AS t(idx)""".stripMargin

  private def q28MediaTopK(s: SparkSession, d: String): DataFrame = {
    val feats = MultimodalOps.featurize(media(s, d), dim = 16).toDF()
    Similarity.bruteForceTopK(feats, feats.filter(col("media_id") < 5),
      "media_id", "feature", k = 3)
  }

  // The featurizer is a classical descriptor of the DECODED media (luma
  // grid / PCM envelope / frame-brightness curve), and the fixtures are
  // id-derived, so the whole decode→embed→top-k chain is still
  // oracle-expressible: rebuild each kind's float feature vector in SQL
  // (integer arithmetic + one FLOAT scale, bit-identical to the Scala
  // side), cast to double, and mirror q21's cosine/rank shape.
  //  - image (solid fill): every nonempty 4×4 grid cell = (r+g+b)/768f;
  //    a cell is empty iff its row/col pixel range is empty at W×H;
  //  - audio: window i covers samples [i·N/16, (i+1)·N/16) of the
  //    arithmetic waveform, floor-mean |amp| / 32768f (N ≥ 50 > 16, so
  //    windows are never empty);
  //  - video (solid frames): resampled frame k = (i·NF)/16's fill / 256f.
  private val q28Sql =
    s"""WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (doc_id % 256) + (doc_id * 7 % 256) + (doc_id * 13 % 256) AS rgb,
      |    $imgW AS iw, $imgH AS ih, $audN AS an, $vidN AS vn
      |  FROM documents),
      |f AS (
      |  SELECT media_id,
      |    CAST(CASE
      |      WHEN media_id % 3 = 0 THEN
      |        [CASE WHEN ((i // 4 + 1) * ih) // 4 > ((i // 4) * ih) // 4
      |              AND ((i % 4 + 1) * iw) // 4 > ((i % 4) * iw) // 4
      |              THEN CAST(rgb AS FLOAT) / CAST(768 AS FLOAT)
      |              ELSE CAST(0 AS FLOAT) END for i in range(0, 16)]
      |      WHEN media_id % 3 = 1 THEN
      |        [CAST(list_sum([abs((media_id * 31 + j * 7) % 2001 - 1000)
      |                        for j in range((i * an) // 16, ((i + 1) * an) // 16)])
      |              // (((i + 1) * an) // 16 - (i * an) // 16) AS FLOAT)
      |           / CAST(32768 AS FLOAT) for i in range(0, 16)]
      |      ELSE
      |        [CAST((media_id * 31 + ((i * vn) // 16) * 7) % 256 AS FLOAT)
      |           / CAST(256 AS FLOAT) for i in range(0, 16)]
      |      END AS DOUBLE[]) AS v
      |  FROM m),
      |q AS (SELECT media_id AS query_id, v AS qv FROM f WHERE media_id < 5),
      |s AS (
      |  SELECT q.query_id, f.media_id AS neighbor_id,
      |    list_inner_product(q.qv, f.v) /
      |      (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(f.v, f.v))) AS c
      |  FROM f CROSS JOIN q WHERE q.query_id <> f.media_id)
      |SELECT query_id, rank, neighbor_id, round(c, 4) AS cos
      |FROM (SELECT *, CAST(row_number() OVER (
      |        PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank
      |      FROM s) WHERE rank <= 3""".stripMargin

  private def q36Resize(s: SparkSession, d: String): DataFrame =
    MultimodalOps.resize(media(s, d), targetBytes = 512)
      .toDF().select("media_id", "kind", "n_bytes_in", "n_bytes_out")

  private val q36Sql =
    s"""SELECT doc_id AS media_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'image'
       |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |  CAST($payloadLen AS INTEGER) AS n_bytes_in,
       |  512 AS n_bytes_out
       |FROM documents""".stripMargin

  // Audio-typed metadata over the REAL javax.sound.sampled decoder: every
  // field — container size, format, frame count, mean |amplitude| — is
  // recomputed by the oracle from the id-derived waveform definition.
  private def q54AudioMeta(s: SparkSession, d: String): DataFrame =
    MultimodalOps.decodeAudioMeta(media(s, d)).toDF()

  private val q54Sql =
    s"""SELECT doc_id AS media_id,
       |  CAST($audLen AS INTEGER) AS n_bytes,
       |  ${MultimodalOps.audioSampleRate} AS sample_rate,
       |  1 AS channels,
       |  CAST($audN AS BIGINT) AS n_samples,
       |  CAST($audMean AS BIGINT) AS mean_abs
       |FROM documents WHERE doc_id % 3 = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_media_meta" -> (q26MediaMeta _),
    "q27_frame_sample" -> (q27FrameSample _),
    "q28_media_embed_topk" -> (q28MediaTopK _),
    "q36_media_resize" -> (q36Resize _),
    "q54_audio_meta" -> (q54AudioMeta _))

  val oracleSql: Map[String, String] = Map(
    "q26_media_meta" -> q26Sql,
    "q27_frame_sample" -> q27Sql,
    "q28_media_embed_topk" -> q28Sql,
    "q36_media_resize" -> q36Sql,
    "q54_audio_meta" -> q54Sql)
}
