package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.10): image/audio/video as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * operators (`mapPartitions` over typed Datasets — the Scala analog of
  * `mapInPandas`: iterator-in/iterator-out, one batch per partition, no
  * per-row UDF dispatch).
  *
  * The IMAGE path is REAL: image rows carry actual PNG bytes and
  * `decodeMeta` decodes them with `javax.imageio` (see [[Png]]) — width,
  * height, channel count, and mean pixel all come from decoded pixels.
  * Audio/video decode stays STUBBED (the JDK ships no audio/video codec
  * and this container has no media libraries): `StubCodecs` documents
  * exactly where ffmpeg/soundfile would plug in and substitutes a
  * deterministic fake so the pipeline — schemas, encoders, partitioning,
  * batch iteration, downstream joins — is real and testable.
  *
  * At scale: binary payloads never pass through a shuffle here; decode and
  * featurize are map-side, and anything keyed (top-k over features) shuffles
  * only the small derived columns.
  */
object MultimodalOps {

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Int,
                       width: Int, height: Int, channels: Int, mean_code: Long)
  case class Frame(media_id: Long, frame_idx: Int, n_bytes: Int)
  case class MediaFeature(media_id: Long, feature: Array[Float])

  /** Where a real ffmpeg/soundfile call would go for audio/video. The fake
    * is a pure function of the payload so tests and oracles are
    * deterministic. (The image path no longer uses this — see [[Png]].) */
  object StubCodecs {
    /** STUB ≙ audio/video stream probe: dimensions derived from payload
      * length, mean from the UTF-8 code points (a real probe returns
      * sample-rate/frame stats). */
    def probeAv(content: Array[Byte]): (Int, Int, Int, Long) = {
      val n = content.length
      val codes = new String(content, "UTF-8").codePoints().toArray
      val mean = if (codes.isEmpty) 0L else codes.map(_.toLong).sum / codes.length
      ((n * 7919) % 1920 + 1, (n * 104729) % 1080 + 1, 3, mean)
    }

    /** STUB ≙ video frame extraction: fixed-size slices stand in for frames. */
    val frameBytes = 256

    /** STUB ≙ a learned visual/audio encoder: a hash-derived unit-scale
      * vector, deterministic per (payload length, position). */
    def featurize(mediaId: Long, content: Array[Byte], dim: Int): Array[Float] = {
      val n = content.length
      Array.tabulate(dim) { i =>
        val h = (mediaId * 31L + i) * 2654435761L + n * 97L
        ((h % 2000L) - 1000L).toFloat / 1000.0f
      }
    }
  }

  /** Deterministic image parameters for a synthetic media id: dimensions
    * and solid-fill RGB a relational oracle can re-derive. */
  def imageParams(id: Long): (Int, Int, Int, Int, Int) =
    ((id % 31 + 1).toInt, (id % 17 + 1).toInt,
      (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)

  /** A synthetic media table. Image rows carry REAL PNG bytes (solid-fill,
    * dimensions/color derived from the id — see `imageParams`), generated
    * executor-side per partition; audio/video rows carry the document text
    * bytes as the opaque payload (deterministic; multi-KB binaries). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, textBytes) =>
        if (id % 3 == 0) {
          val (w, h, r, g, b) = imageParams(id)
          MediaRow(id, "image", Png.encodeSolid(w, h, r, g, b))
        } else MediaRow(id, if (id % 3 == 1) "audio" else "video", textBytes)
      })
  }

  /** Decode/metadata extraction — batch-per-partition over the binary
    * column. Images go through the REAL `javax.imageio` decoder; the
    * audio/video probe is the stub. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, c, mean) =
        if (m.kind == "image") Png.decode(m.content)
        else StubCodecs.probeAv(m.content)
      MediaMeta(m.media_id, m.kind, m.content.length, w, h, c, mean)
    })
  }

  /** Frame sampling: every `everyN`-th fixed-size slice of the payload
    * (≙ ffmpeg -vf select; one output row per sampled frame). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      val nFrames = (m.content.length + StubCodecs.frameBytes - 1) / StubCodecs.frameBytes
      (0 until nFrames by everyN).map { idx =>
        val start = idx * StubCodecs.frameBytes
        Frame(m.media_id, idx,
          math.min(StubCodecs.frameBytes, m.content.length - start))
      }
    })
  }

  case class ResizedMedia(media_id: Long, kind: String, n_bytes_in: Int,
                          n_bytes_out: Int, content_out: Array[Byte])

  /** Resize ≙ re-encode to a fixed target size: truncate or cycle-pad the
    * payload to `targetBytes` (a real implementation decodes, scales, and
    * re-encodes; the byte plumbing — new binary column, deterministic
    * output size — is what's exercised). */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val out = Array.tabulate[Byte](targetBytes) { i =>
        if (m.content.isEmpty) 0 else m.content(i % m.content.length)
      }
      ResizedMedia(m.media_id, m.kind, m.content.length, out.length, out)
    })
  }

  /** Feature extraction to a dense vector column — composable with the
    * Similarity operators (brute-force / IVF top-k). */
  def featurize(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      MediaFeature(m.media_id, StubCodecs.featurize(m.media_id, m.content, dim))))
  }
}
