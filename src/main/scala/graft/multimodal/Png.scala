package graft.multimodal

import java.io.ByteArrayInputStream
import java.util.zip.{Adler32, CRC32}

/** Real PNG support for the multimodal image path, using only the JDK.
  *
  * `decode` is a genuine codec call — `javax.imageio.ImageIO.read` parses
  * the container, inflates the IDAT stream, and hands back actual pixels;
  * width/height/band-count/mean-sample all come from the decoded raster.
  *
  * `encodeSolid` writes a spec-valid truecolor PNG by hand with STORED
  * (uncompressed) deflate blocks. Hand-writing instead of `ImageIO.write`
  * buys a property no off-the-shelf encoder gives: the byte length is an
  * exact arithmetic function of the dimensions —
  *
  *   len = 63 + 5*ceil(raw/65535) + raw,   raw = h*(3*w+1)
  *
  * (8 signature + 25 IHDR + 12 IDAT overhead + 2 zlib header + 5 per
  * stored block + raw scanlines + 4 adler + 12 IEND) — so fixture
  * generation is executor-side and deterministic, and a relational oracle
  * can verify even the payload SIZE of a real decodable image.
  */
object Png {

  private def writeInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); writeInt(len, 0, data.length)
    out.write(len, 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32(); crc.update(t); crc.update(data)
    val c = new Array[Byte](4); writeInt(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  /** zlib stream with STORED deflate blocks: 0x78 0x01 header, 5-byte
    * block headers (final flag, LEN, ~LEN), raw bytes, Adler-32. */
  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val maxBlock = 65535
    val out = new java.io.ByteArrayOutputStream(raw.length + 16)
    out.write(0x78); out.write(0x01)
    var off = 0
    while (off < raw.length) {
      val n = math.min(maxBlock, raw.length - off)
      out.write(if (off + n >= raw.length) 1 else 0)
      out.write(n & 0xff); out.write((n >>> 8) & 0xff)
      out.write(~n & 0xff); out.write((~n >>> 8) & 0xff)
      out.write(raw, off, n)
      off += n
    }
    val ad = new Adler32(); ad.update(raw)
    val a = new Array[Byte](4); writeInt(a, 0, ad.getValue.toInt)
    out.write(a, 0, 4)
    out.toByteArray
  }

  /** A solid-fill w×h 8-bit RGB PNG. Decoders see exactly (r, g, b) at
    * every pixel (PNG is lossless), so downstream stats are predictable. */
  def encodeSolid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"invalid dimensions ${w}x$h")
    val raw = new Array[Byte](h * (3 * w + 1))
    var i = 0
    var y = 0
    while (y < h) {
      raw(i) = 0 // per-scanline filter byte: None
      i += 1
      var x = 0
      while (x < w) {
        raw(i) = r.toByte; raw(i + 1) = g.toByte; raw(i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(raw.length + 80)
    out.write(Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    writeInt(ihdr, 0, w); writeInt(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zlibStored(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A 2-D-gradient w×h truecolor PNG: pixel `(x, y)` carries the gray
    * value `(base + slopeX·x + slopeY·y) mod 256` in all three channels
    * — steep slopes wrap several times across the frame, so the wrap
    * PATTERN (what a difference hash fingerprints) varies in both axes
    * and all 64 dHash bits are informative. Same hand-written
    * STORED-deflate container as [[encodeSolid]], so the payload is
    * spec-valid, `ImageIO`-decodable, and every decoded sample is an
    * exact arithmetic function of `(base, slopeX, slopeY, x, y)` a
    * relational oracle can re-derive. */
  def encodeGradient(w: Int, h: Int, base: Int, slopeX: Int, slopeY: Int)
      : Array[Byte] = {
    require(w > 0 && h > 0, s"invalid dimensions ${w}x$h")
    val raw = new Array[Byte](h * (3 * w + 1))
    var i = 0
    var y = 0
    while (y < h) {
      raw(i) = 0 // filter: None
      i += 1
      var x = 0
      while (x < w) {
        val v = Math.floorMod(base + slopeX * x + slopeY * y, 256).toByte
        raw(i) = v; raw(i + 1) = v; raw(i + 2) = v
        i += 3; x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(raw.length + 80)
    out.write(Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    writeInt(ihdr, 0, w); writeInt(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = 2
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zlibStored(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Difference hash (dHash) over the DECODED pixels: sample a 9×8 luma
    * grid by nearest pixel — `s(r, c)` = band-sum at
    * `(⌊c·w/9⌋, ⌊r·h/8⌋)` — and set bit `r·8+c` when
    * `s(r, c) > s(r, c+1)`. The perceptual-dedup fingerprint for
    * images: gradient STRUCTURE survives re-encodes and brightness
    * shifts that change every content byte, so Hamming-close dHashes
    * mean visually-near-duplicate images (Krawetz's dHash, the
    * standard cheap perceptual hash). Total for any image ≥ 1×1
    * (nearest-sample never reads out of bounds); every sample is a real
    * `ImageIO` raster read. */
  def dHashSampled(content: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(content))
    require(img != null, "payload is not a decodable image")
    val raster = img.getRaster
    val bands = raster.getNumBands
    val w = img.getWidth; val h = img.getHeight
    def s(xc: Int, yr: Int): Long = {
      var c = 0; var sum = 0L
      while (c < bands) { sum += raster.getSample(xc, yr, c); c += 1 }
      sum
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      val yr = r * h / 8
      var c = 0
      while (c < 8) {
        if (s(c * w / 9, yr) > s((c + 1) * w / 9, yr))
          bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Expected `encodeSolid` output size — the oracle-side length formula. */
  def encodedLength(w: Int, h: Int): Int = {
    val raw = h * (3 * w + 1)
    63 + 5 * ((raw + 65534) / 65535) + raw
  }

  /** REAL image decode via `javax.imageio`: returns (width, height, bands,
    * mean sample value across all pixels and bands, floor division). */
  def decode(content: Array[Byte]): (Int, Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(content))
    require(img != null, "payload is not a decodable image")
    val raster = img.getRaster
    val bands = raster.getNumBands
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        var c = 0
        while (c < bands) { sum += raster.getSample(x, y, c); c += 1 }
        x += 1
      }
      y += 1
    }
    val count = img.getWidth.toLong * img.getHeight * bands
    (img.getWidth, img.getHeight, bands, sum / count)
  }

  /** g×g downsampled "luma" grid over the decoded pixels: cell (gy, gx)
    * covers rows [gy·h/g, (gy+1)·h/g) × cols [gx·w/g, (gx+1)·w/g) and
    * carries the floor-mean of the per-pixel band SUM (r+g+b for RGB) —
    * pure integer until the caller scales. Empty cells (image smaller
    * than the grid on an axis) carry 0. Row-major, length g·g. */
  def cellMeans(content: Array[Byte], g: Int): Array[Long] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(content))
    require(img != null, "payload is not a decodable image")
    val raster = img.getRaster
    val bands = raster.getNumBands
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Long](g * g)
    var gy = 0
    while (gy < g) {
      val y0 = (gy.toLong * h / g).toInt; val y1 = ((gy + 1).toLong * h / g).toInt
      var gx = 0
      while (gx < g) {
        val x0 = (gx.toLong * w / g).toInt; val x1 = ((gx + 1).toLong * w / g).toInt
        if (y1 > y0 && x1 > x0) {
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              var c = 0
              while (c < bands) { sum += raster.getSample(x, y, c); c += 1 }
              x += 1
            }
            y += 1
          }
          out(gy * g + gx) = sum / ((y1 - y0).toLong * (x1 - x0))
        }
        gx += 1
      }
      gy += 1
    }
    out
  }
}
