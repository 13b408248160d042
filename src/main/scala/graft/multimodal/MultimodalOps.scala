package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.10): image/audio/video as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * operators (`mapPartitions` over typed Datasets — the Scala analog of
  * `mapInPandas`: iterator-in/iterator-out, one batch per partition, no
  * per-row UDF dispatch).
  *
  * The IMAGE and AUDIO paths are REAL: image rows carry actual PNG bytes
  * decoded with `javax.imageio` (see [[Png]]) — width, height, channel
  * count, mean pixel all from decoded pixels — and audio rows carry
  * actual RIFF/WAV bytes decoded with `javax.sound.sampled` (see [[Wav]])
  * — sample rate, channels, frame count, mean amplitude all from decoded
  * PCM samples. Only VIDEO decode stays STUBBED (the JDK ships no video
  * codec and this container has no media libraries): `StubCodecs`
  * documents exactly where ffmpeg would plug in and substitutes a
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

  /** Where a real ffmpeg call would go for video. The fake is a pure
    * function of the payload so tests and oracles are deterministic.
    * (Image and audio no longer use this — see [[Png]] and [[Wav]].) */
  object StubCodecs {
    /** STUB ≙ video stream probe: dimensions derived from payload
      * length, mean from the UTF-8 code points (a real probe returns
      * frame stats). */
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

  /** Deterministic audio parameters: sample count + the i-th PCM sample,
    * both arithmetic in the id so a relational oracle can re-derive the
    * decoded waveform exactly. */
  def audioNumSamples(id: Long): Int = (id % 400 + 50).toInt
  def audioSample(id: Long, i: Int): Short =
    ((id * 31 + i * 7) % 2001 - 1000).toShort
  val audioSampleRate = 8000

  /** A synthetic media table. Image rows carry REAL PNG bytes (solid-fill,
    * dimensions/color derived from the id — `imageParams`); audio rows
    * carry REAL RIFF/WAV bytes (16-bit mono PCM, waveform derived from the
    * id — `audioSample`); both generated executor-side per partition.
    * Video rows carry the document text bytes as the opaque payload
    * (deterministic; multi-KB binaries). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, textBytes) =>
        if (id % 3 == 0) {
          val (w, h, r, g, b) = imageParams(id)
          MediaRow(id, "image", Png.encodeSolid(w, h, r, g, b))
        } else if (id % 3 == 1) {
          val samples = Array.tabulate(audioNumSamples(id))(audioSample(id, _))
          MediaRow(id, "audio", Wav.encodePcm16Mono(audioSampleRate, samples))
        } else MediaRow(id, "video", textBytes)
      })
  }

  /** Decode/metadata extraction — batch-per-partition over the binary
    * column. Images go through the REAL `javax.imageio` decoder, audio
    * through the REAL `javax.sound.sampled` decoder (frames × 1 as the
    * generic dims, mean |amplitude| as the code); the video probe is the
    * stub. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, c, mean) = m.kind match {
        case "image" => Png.decode(m.content)
        case "audio" =>
          val (_, ch, frames, meanAbs) = Wav.decode(m.content)
          (frames.toInt, 1, ch, meanAbs)
        case _ => StubCodecs.probeAv(m.content)
      }
      MediaMeta(m.media_id, m.kind, m.content.length, w, h, c, mean)
    })
  }

  case class AudioMeta(media_id: Long, n_bytes: Int, sample_rate: Int,
                       channels: Int, n_samples: Long, mean_abs: Long)

  /** Audio-typed metadata over the REAL WAV decoder — the audio analog of
    * q26's generic decode, with the format fields spelled out. */
  def decodeAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.map { m =>
      val (rate, ch, frames, meanAbs) = Wav.decode(m.content)
      AudioMeta(m.media_id, m.content.length, rate, ch, frames, meanAbs)
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
