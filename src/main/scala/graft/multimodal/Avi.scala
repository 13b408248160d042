package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real AVI (RIFF) container support for the multimodal video path, using
  * only the JDK — the same upgrade [[Png]] gave images and [[Wav]] gave
  * audio. The JDK ships no video CODEC, but AVI with uncompressed DIB
  * frames (`biCompression = BI_RGB`) needs none: the container IS the
  * format, and width / height / bit depth / frame count / raw pixel bytes
  * are all genuinely parsed out of container structure by `decode` — a
  * spec-conformant chunk walk (word-aligned chunks, nested LISTs), not a
  * fixture-shaped offset peek.
  *
  * `encodeSolid` writes a spec-valid single-stream `vids/DIB ` AVI with
  * one solid-fill 24-bit frame per entry of `frameFills`. Like the PNG and
  * WAV writers, the layout is chosen so the byte length is exact
  * arithmetic in the parameters —
  *
  *   len = 224 + nFrames * (8 + w*h*3)
  *
  * (12 RIFF header + 200 hdrl LIST (avih 56 + one strl with strh 56 /
  * strf 40) + 12 movi LIST header + one `00db` chunk per frame) — so
  * fixtures generate executor-side and a relational oracle can verify the
  * payload SIZE of a real parseable video. `w` must be even so `w*h*3` is
  * even and frame chunks need no RIFF pad byte, keeping the formula exact.
  */
object Avi {

  /** Expected `encodeSolid` output size — the oracle-side formula. */
  def encodedLength(w: Int, h: Int, nFrames: Int): Int =
    224 + nFrames * (8 + w * h * 3)

  /** Single-stream uncompressed-DIB AVI; frame f is a solid fill of byte
    * `frameFills(f)` across all w*h*3 samples. */
  def encodeSolid(w: Int, h: Int, frameFills: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && frameFills.nonEmpty, "empty video")
    require(w % 2 == 0,
      "even width keeps w*h*3 even so frame chunks carry no RIFF pad byte")
    val fb = w * h * 3
    val nF = frameFills.length
    val total = encodedLength(w, h, nF)
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(total - 8); fourcc("AVI ")
    // ---- LIST hdrl: avih + one LIST strl --------------------------------
    fourcc("LIST"); buf.putInt(192); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(40000)          // dwMicroSecPerFrame: 25 fps
    buf.putInt(fb * 25)        // dwMaxBytesPerSec
    buf.putInt(0)              // dwPaddingGranularity
    buf.putInt(0)              // dwFlags (no index)
    buf.putInt(nF)             // dwTotalFrames
    buf.putInt(0)              // dwInitialFrames
    buf.putInt(1)              // dwStreams
    buf.putInt(fb)             // dwSuggestedBufferSize
    buf.putInt(w); buf.putInt(h)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0) // dwReserved
    fourcc("LIST"); buf.putInt(116); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0)              // dwFlags
    buf.putShort(0); buf.putShort(0) // wPriority, wLanguage
    buf.putInt(0)              // dwInitialFrames
    buf.putInt(1)              // dwScale
    buf.putInt(25)             // dwRate (frames/sec = rate/scale)
    buf.putInt(0)              // dwStart
    buf.putInt(nF)             // dwLength (in frames)
    buf.putInt(fb)             // dwSuggestedBufferSize
    buf.putInt(-1)             // dwQuality (default)
    buf.putInt(fb)             // dwSampleSize
    buf.putShort(0); buf.putShort(0)                 // rcFrame left, top
    buf.putShort(w.toShort); buf.putShort(h.toShort) // rcFrame right, bottom
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40)             // biSize (BITMAPINFOHEADER)
    buf.putInt(w); buf.putInt(h)
    buf.putShort(1)            // biPlanes
    buf.putShort(24)           // biBitCount: packed RGB
    buf.putInt(0)              // biCompression: BI_RGB (uncompressed)
    buf.putInt(fb)             // biSizeImage
    buf.putInt(0); buf.putInt(0) // biXPelsPerMeter, biYPelsPerMeter
    buf.putInt(0); buf.putInt(0) // biClrUsed, biClrImportant
    // ---- LIST movi: one 00db chunk per frame ----------------------------
    fourcc("LIST"); buf.putInt(4 + nF * (8 + fb)); fourcc("movi")
    var f = 0
    while (f < nF) {
      fourcc("00db"); buf.putInt(fb)
      val fill = (frameFills(f) & 0xff).toByte
      var i = 0
      while (i < fb) { buf.put(fill); i += 1 }
      f += 1
    }
    buf.array()
  }

  /** REAL container decode: walks the RIFF chunk tree (word-aligned sizes,
    * nested LISTs) and returns (width, height, channels, meanPixel) —
    * width/height from `avih`, channels from the `strf` BITMAPINFOHEADER
    * bit depth, mean from the actual pixel bytes of every `00db`/`00dc`
    * frame chunk (floor division). Validates the header frame count
    * against the frames physically present in `movi`. */
  def decode(content: Array[Byte]): (Int, Int, Int, Long) = {
    val meta = parse(content)
    require(meta.totalFrames == meta.framesSeen,
      s"avih says ${meta.totalFrames} frames, movi carries ${meta.framesSeen}")
    val mean =
      if (meta.pixelCount == 0) 0L else meta.pixelSum / meta.pixelCount
    (meta.width, meta.height, meta.bitCount / 8, mean)
  }

  /** The `movi` frame chunks as (frame_idx, n_bytes), in stream order —
    * what frame sampling iterates. */
  def frames(content: Array[Byte]): IndexedSeq[(Int, Int)] =
    parse(content).frames.toIndexedSeq

  /** Floor-mean pixel byte of each decoded frame, in stream order — the
    * per-frame brightness curve, pure integer until the caller scales. */
  def frameMeans(content: Array[Byte]): IndexedSeq[Long] =
    parse(content).frameMeans.toIndexedSeq

  private final class Parsed {
    var width = -1; var height = -1; var bitCount = -1; var totalFrames = -1
    var framesSeen = 0
    var pixelSum = 0L; var pixelCount = 0L
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val frameMeans = scala.collection.mutable.ArrayBuffer.empty[Long]
  }

  private def parse(content: Array[Byte]): Parsed = {
    val bb = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    def fourccAt(off: Int): String = new String(content, off, 4, "US-ASCII")
    require(content.length >= 12 && fourccAt(0) == "RIFF" &&
      fourccAt(8) == "AVI ", "not a RIFF/AVI container")
    require(8 + bb.getInt(4) <= content.length,
      s"truncated container: RIFF declares ${8 + bb.getInt(4)} bytes, " +
        s"payload carries ${content.length}")
    val p = new Parsed
    def walk(start: Int, stop: Int): Unit = {
      var off = start
      while (off + 8 <= stop) {
        val cc = fourccAt(off)
        val size = bb.getInt(off + 4)
        require(size >= 0 && off + 8 + size <= stop,
          s"chunk $cc overruns its parent")
        if (cc == "LIST") walk(off + 12, off + 8 + size)
        else cc match {
          case "avih" =>
            p.totalFrames = bb.getInt(off + 8 + 16)
            p.width = bb.getInt(off + 8 + 32)
            p.height = bb.getInt(off + 8 + 36)
          case "strf" =>
            p.bitCount = bb.getShort(off + 8 + 14).toInt
          case "00db" | "00dc" =>
            p.frames += ((p.framesSeen, size))
            p.framesSeen += 1
            var i = off + 8
            val end = off + 8 + size
            var frameSum = 0L
            while (i < end) { frameSum += (content(i) & 0xff); i += 1 }
            p.frameMeans += (if (size == 0) 0L else frameSum / size)
            p.pixelSum += frameSum
            p.pixelCount += size
          case _ => () // unknown chunks are legal RIFF; skip
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, 8 + bb.getInt(4))
    require(p.width > 0 && p.height > 0 && p.bitCount > 0,
      "missing avih/strf headers")
    p
  }

  /** Brightness-curve difference hash over the REAL parsed frames — the
    * video analog of [[Png.dHashSampled]]: the per-frame mean-pixel
    * curve ([[frameMeans]]) is resampled to 65 points by nearest frame
    * (`f(j) = means[⌊j·nF/65⌋]`), bit `j` set when point `j` is
    * brighter than point `j+1`. Re-encodes and level shifts change
    * every frame byte but keep the brightness SHAPE, so Hamming-close
    * hashes mean perceptually-near-duplicate clips. Total for any clip
    * with ≥ 1 frame. */
  def curveHash(content: Array[Byte]): Long = {
    val fm = frameMeans(content)
    require(fm.nonEmpty, "clip has no frames")
    // long multiply: 34M+ tiny frames overflow Int at j*nF (the same
    // guard Wav.windowMeanAbs carries on its window arithmetic)
    def p(j: Int): Long = fm((j.toLong * fm.length / 65).toInt)
    var bits = 0L
    var j = 0
    while (j < 64) {
      if (p(j) > p(j + 1)) bits |= 1L << j
      j += 1
    }
    bits
  }
}
