package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.10): image/audio/video as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * operators (`mapPartitions` over typed Datasets — the Scala analog of
  * `mapInPandas`: iterator-in/iterator-out, one batch per partition, no
  * per-row UDF dispatch).
  *
  * ALL THREE media kinds are REAL containers now: image rows carry actual
  * PNG bytes decoded with `javax.imageio` (see [[Png]]) — width, height,
  * channel count, mean pixel all from decoded pixels; audio rows carry
  * actual RIFF/WAV bytes decoded with `javax.sound.sampled` (see [[Wav]])
  * — sample rate, channels, frame count, mean amplitude all from decoded
  * PCM samples; video rows carry actual RIFF/AVI bytes with uncompressed
  * DIB frames, parsed by an in-repo spec-conformant chunk walker (see
  * [[Avi]]) — width, height, bit depth, frame count, mean pixel all read
  * from container structure and real frame bytes. Feature extraction
  * ([[ContentFeatures]]) is likewise computed from the decoded signal
  * (luma grid / PCM envelope / frame-brightness curve) — a LEARNED
  * encoder would replace those descriptors behind the same schema,
  * batching, and downstream top-k, all of which are oracle-checked.
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

  /** Deterministic features of the DECODED media — classical signal
    * descriptors, not a learned model (no model weights belong in this
    * container), but every value comes from real decoded content:
    *  - image: g×g downsampled luma grid (g = ⌊√dim⌋) over the
    *    `javax.imageio`-decoded pixels, per-cell floor-mean band sum
    *    scaled by 1/768 (3 bands × 256) — cells beyond g·g are 0;
    *  - audio: dim-window envelope over the `javax.sound.sampled`-decoded
    *    PCM stream, per-window floor-mean |amplitude| scaled by 1/32768;
    *  - video: per-frame brightness curve from the RIFF/AVI frame bytes,
    *    resampled to dim frames, scaled by 1/256.
    * All arithmetic is integer until the single float scale, so the
    * embed→top-k chain stays bit-for-bit oracle-replayable. */
  object ContentFeatures {
    def featurize(kind: String, content: Array[Byte], dim: Int): Array[Float] =
      kind match {
        case "image" =>
          val g = math.sqrt(dim.toDouble).toInt
          val cells = Png.cellMeans(content, g)
          Array.tabulate(dim)(i =>
            if (i < g * g) cells(i) / 768.0f else 0.0f)
        case "audio" =>
          val means = Wav.windowMeanAbs(content, dim)
          Array.tabulate(dim)(means(_) / 32768.0f)
        case "video" =>
          val fm = Avi.frameMeans(content)
          // a container with zero movi frames has no brightness curve
          if (fm.isEmpty) Array.fill(dim)(0.0f)
          else Array.tabulate(dim)(i =>
            fm((i.toLong * fm.length / dim).toInt) / 256.0f)
        // unknown kinds get a defined (zero) feature instead of being
        // fed to a parser that will throw — featurize stays total
        case _ => Array.fill(dim)(0.0f)
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

  /** Deterministic video parameters for a synthetic media id: even width
    * (unpadded AVI frame chunks), height, frame count, and the solid fill
    * byte of frame f — all arithmetic in the id for the oracle. */
  def videoParams(id: Long): (Int, Int, Int) =
    (((id % 16) + 1).toInt * 2, (id % 9 + 2).toInt, (id % 24 + 2).toInt)
  def videoFrameFill(id: Long, f: Int): Int = ((id * 31 + f * 7) % 256).toInt

  /** A synthetic media table — every kind is a REAL container generated
    * executor-side per partition: image rows are decodable PNGs
    * (solid-fill, dims/color from `imageParams`), audio rows are decodable
    * RIFF/WAVs (16-bit mono PCM, waveform from `audioSample`), video rows
    * are parseable RIFF/AVIs with uncompressed DIB frames (dims/frame
    * count/fills from `videoParams`/`videoFrameFill`). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        if (id % 3 == 0) {
          val (w, h, r, g, b) = imageParams(id)
          MediaRow(id, "image", Png.encodeSolid(w, h, r, g, b))
        } else if (id % 3 == 1) {
          val samples = Array.tabulate(audioNumSamples(id))(audioSample(id, _))
          MediaRow(id, "audio", Wav.encodePcm16Mono(audioSampleRate, samples))
        } else {
          val (w, h, nF) = videoParams(id)
          MediaRow(id, "video",
            Avi.encodeSolid(w, h, Array.tabulate(nF)(videoFrameFill(id, _))))
        }
      })
  }

  /** Decode/metadata extraction — batch-per-partition over the binary
    * column. Images go through the REAL `javax.imageio` decoder, audio
    * through the REAL `javax.sound.sampled` decoder (frames × 1 as the
    * generic dims, mean |amplitude| as the code), video through the REAL
    * RIFF/AVI container parse (dims + bit depth from the headers, mean
    * over actual frame pixel bytes). */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, c, mean) = m.kind match {
        case "image" => Png.decode(m.content)
        case "audio" =>
          val (_, ch, frames, meanAbs) = Wav.decode(m.content)
          (frames.toInt, 1, ch, meanAbs)
        case _ => Avi.decode(m.content)
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

  /** Frame sampling: every `everyN`-th REAL `00db` frame chunk of the AVI
    * container (≙ ffmpeg -vf select; one output row per sampled frame,
    * sizes read from the movi chunk headers). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      Avi.frames(m.content).collect {
        case (idx, nBytes) if idx % everyN == 0 => Frame(m.media_id, idx, nBytes)
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

  /** Deterministic GRADIENT image parameters for a synthetic media id:
    * `(w, h, base, slopeX, slopeY)`. The id hashes (Knuth
    * multiplicative, mod-4096 pre-reduced so the product never overflows
    * at any id) into a class that fixes dimensions and both gradient
    * slopes; a 2·(id mod 3) brightness jitter rides on top, so ids in
    * the same class are VISUALLY near-identical (dHash Hamming ≈ 0–4)
    * without being byte-identical — the structure a perceptual-dedup
    * arm exists to find. Dimensions stay ≥ the 9×8 sample grid and
    * slopes are STEEP (the mod-256 gray ramp wraps several times per
    * frame), so the wrap pattern — what dHash fingerprints — varies in
    * both axes and distinct classes land on well-separated signatures.
    * All arithmetic is oracle-replayable. */
  def gradientParams(id: Long): (Int, Int, Int, Int, Int) = {
    val k = ((id % 4096 + 4096) % 4096) * 2654435761L % 4096
    ((k % 23 + 9).toInt, (k % 10 + 8).toInt,
      ((k / 155 % 8) * 32 + (id % 3) * 2).toInt,
      ((k / 31 % 5) * 32 + 16).toInt, ((k / 11 % 4) * 64 + 32).toInt)
  }

  /** A gradient-image media table over an id column — one REAL decodable
    * PNG per id, generated executor-side (payloads never shuffle). */
  def gradientImages(ids: DataFrame): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.as[Long].mapPartitions(_.map { id =>
      val (w, h, base, slopeX, slopeY) = gradientParams(id)
      MediaRow(id, "image", Png.encodeGradient(w, h, base, slopeX, slopeY))
    })
  }

  case class MediaSig(id: Long, sig: Long)

  /** Deterministic sawtooth-TONE parameters for a synthetic audio id:
    * `(nSamples, step, base)` — same class-hash + jitter scheme as
    * [[gradientParams]]: the mod-4096 class fixes length and sweep
    * step; a ± (id mod 3) amplitude offset rides on top, so same-class
    * ids are envelope-near without being byte-identical. `nSamples ≥
    * 130` keeps every one of the 65 envelope windows non-empty. */
  def toneParams(id: Long): (Int, Int, Int) = {
    val k = ((id % 4096 + 4096) % 4096) * 2654435761L % 4096
    ((k % 200 + 130).toInt, (k / 7 % 97 + 11).toInt,
      ((k / 11 % 50) * 40 + id % 3).toInt)
  }

  /** A sawtooth-tone audio table over an id column — one REAL decodable
    * 16-bit PCM WAV per id, sample `i` = `(base + i·step) mod 2001 −
    * 1000`, generated executor-side. */
  def toneAudio(ids: DataFrame): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.as[Long].mapPartitions(_.map { id =>
      val (n, step, base) = toneParams(id)
      val samples =
        Array.tabulate(n)(i => ((base + i * step) % 2001 - 1000).toShort)
      MediaRow(id, "audio", Wav.encodePcm16Mono(audioSampleRate, samples))
    })
  }

  /** Deterministic brightness-RAMP parameters for a synthetic video id:
    * `(w, h, nFrames, step, base)` — class fixes dims, length, and the
    * per-frame fill ramp; a ± (id mod 3) level jitter rides on top. */
  def clipParams(id: Long): (Int, Int, Int, Int, Int) = {
    val k = ((id % 4096 + 4096) % 4096) * 2654435761L % 4096
    // steep steps: the mod-256 ramp wraps ~10-50 times per clip, so the
    // wrap pattern (what the curve hash fingerprints) is bit-rich and
    // distinct classes land on well-separated signatures
    (((k % 8) + 1).toInt * 2, (k % 9 + 2).toInt, (k % 30 + 35).toInt,
      ((k / 13 % 31) * 8 + 9).toInt, ((k / 11 % 8) * 32 + id % 3).toInt)
  }

  /** A brightness-ramp video table over an id column — one REAL
    * parseable RIFF/AVI per id, frame `f` solid-filled with
    * `(base + f·step) mod 256`, generated executor-side. */
  def clipVideo(ids: DataFrame): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.as[Long].mapPartitions(_.map { id =>
      val (w, h, nF, step, base) = clipParams(id)
      MediaRow(id, "video", Avi.encodeSolid(w, h,
        Array.tabulate(nF)(f => Math.floorMod(base + f * step, 256))))
    })
  }

  /** Envelope fingerprints of every audio row (REAL PCM decode,
    * map-side; only `(id, sig)` leaves the scan) — feeds
    * [[graft.operators.NearDup.hammingBandPairs]] like [[dHashes]]. */
  def envelopeHashes(media: Dataset[MediaRow]): Dataset[MediaSig] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .mapPartitions(_.map(m => MediaSig(m.media_id,
        Wav.envelopeHash(m.content))))
  }

  /** Brightness-curve fingerprints of every video row (REAL container
    * parse, map-side) — feeds the same banded-Hamming chain. */
  def curveHashes(media: Dataset[MediaRow]): Dataset[MediaSig] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .mapPartitions(_.map(m => MediaSig(m.media_id,
        Avi.curveHash(m.content))))
  }

  /** Perceptual fingerprints: dHash over the DECODED pixels of every
    * image row, batch-per-partition like [[decodeMeta]] — the binary
    * column never shuffles; only `(id, 64-bit sig)` leaves the scan.
    * Output feeds [[graft.operators.NearDup.hammingBandPairs]] — the
    * image-dedup chain (decode → perceptual hash → banded Hamming join)
    * with the same banding trade as the simhash family. */
  def dHashes(media: Dataset[MediaRow]): Dataset[MediaSig] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .mapPartitions(_.map(m => MediaSig(m.media_id,
        Png.dHashSampled(m.content))))
  }

  /** Feature extraction to a dense vector column — composable with the
    * Similarity operators (brute-force / IVF top-k). Features are
    * classical descriptors of the DECODED content ([[ContentFeatures]]):
    * luma grid / audio envelope / frame-brightness curve. */
  def featurize(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      MediaFeature(m.media_id, ContentFeatures.featurize(m.kind, m.content, dim))))
  }
}
