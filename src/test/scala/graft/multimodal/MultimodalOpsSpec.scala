package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing: typed Dataset shapes, real container round trips
  * (PNG / WAV / AVI), frame-sampling over real movi chunks, feature
  * vectors feeding similarity ops. */
class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._
  import MultimodalOps._

  private def media(rows: (Long, String, Array[Byte])*): org.apache.spark.sql.Dataset[MediaRow] =
    rows.map { case (id, kind, bytes) => MediaRow(id, kind, bytes) }.toDS()

  test("Avi round trip: chunk walker parses hand-written container exactly") {
    val fills = Array(10, 200, 0, 255)
    val bytes = Avi.encodeSolid(6, 4, fills) // fb = 72 bytes/frame
    assert(bytes.length === Avi.encodedLength(6, 4, fills.length))
    val (w, h, c, mean) = Avi.decode(bytes)
    assert((w, h, c) === ((6, 4, 3)))
    // solid fills → grand mean = floor(sum(fills)/n)
    assert(mean === fills.map(_.toLong).sum / fills.length)
    assert(Avi.frames(bytes).toSeq ===
      Seq((0, 72), (1, 72), (2, 72), (3, 72)))
    // header frame count is validated against physical movi chunks
    val truncated = java.util.Arrays.copyOf(bytes, bytes.length - 80)
    intercept[IllegalArgumentException](Avi.decode(truncated))
    intercept[IllegalArgumentException](
      Avi.decode("RIFFxxxxWAVE".getBytes("US-ASCII")))
  }

  test("decodeMeta: video stats come from real AVI container parse") {
    val id = 2L // % 3 == 2 → video
    val (w, h, nF) = videoParams(id)
    val payload = Avi.encodeSolid(w, h, Array.tabulate(nF)(videoFrameFill(id, _)))
    val m = decodeMeta(media((id, "video", payload))).collect().head
    assert(m.n_bytes === Avi.encodedLength(w, h, nF))
    assert(m.width === w && m.height === h && m.channels === 3)
    assert(m.mean_code ===
      (0 until nF).map(videoFrameFill(id, _).toLong).sum / nF)
  }

  test("Png round trip: ImageIO decodes hand-written PNG bit-exactly") {
    // a real javax.imageio decode of the stored-deflate writer's output:
    // dimensions, band count, and every pixel must come back exactly
    val bytes = Png.encodeSolid(5, 3, 10, 20, 33)
    assert(bytes.length === Png.encodedLength(5, 3))
    assert(bytes.length === 68 + 3 * (3 * 5 + 1)) // 63 + 5*1 + raw
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth === 5 && img.getHeight === 3)
    val raster = img.getRaster
    assert(raster.getNumBands === 3)
    for (x <- 0 until 5; y <- 0 until 3)
      assert((raster.getSample(x, y, 0), raster.getSample(x, y, 1),
        raster.getSample(x, y, 2)) === ((10, 20, 33)))
    val (w, h, c, mean) = Png.decode(bytes)
    assert((w, h, c) === ((5, 3, 3)))
    assert(mean === (10L + 20L + 33L) / 3) // solid fill → exact channel mean
  }

  test("decodeMeta: image rows are decoded from real PNG payloads") {
    val id = 6L // % 3 == 0 → image
    val (w, h, r, g, b) = imageParams(id)
    val row = MediaRow(id, "image", Png.encodeSolid(w, h, r, g, b))
    val out = decodeMeta(spark.createDataset(Seq(row))).collect().head
    assert(out.width === w && out.height === h && out.channels === 3)
    assert(out.mean_code === (r + g + b).toLong / 3)
    assert(out.n_bytes === Png.encodedLength(w, h))
  }

  test("mediaFromDocuments: all three kinds carry decodable real payloads") {
    val docs = Seq((0L, "some text"), (1L, "other"), (2L, "third"))
      .toDF("doc_id", "text")
    val rows = mediaFromDocuments(docs).collect().sortBy(_.media_id)
    assert(rows.map(_.kind).toSeq === Seq("image", "audio", "video"))
    val (w, h, r, g, b) = imageParams(0L)
    assert(Png.decode(rows(0).content) === ((w, h, 3, (r + g + b).toLong / 3)))
    val (rate, ch, frames, _) = Wav.decode(rows(1).content)
    assert((rate, ch, frames) ===
      ((audioSampleRate, 1, audioNumSamples(1L).toLong)))
    val (vw, vh, nF) = videoParams(2L)
    val (dw, dh, dc, _) = Avi.decode(rows(2).content)
    assert((dw, dh, dc) === ((vw, vh, 3)))
    assert(Avi.frames(rows(2).content).length === nF)
  }

  test("Wav round trip: javax.sound.sampled decodes hand-written PCM exactly") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val bytes = Wav.encodePcm16Mono(8000, samples)
    assert(bytes.length === Wav.encodedLength(samples.length))
    val in = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate === 8000.0f && fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    assert(in.getFrameLength === samples.length)
    // decoded PCM bytes must be the samples bit-for-bit (little-endian)
    val pcm = in.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(pcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(Array.tabulate(samples.length)(i => bb.getShort(i * 2)) === samples)
    val (_, _, frames, meanAbs) = Wav.decode(bytes)
    assert(frames === samples.length)
    assert(meanAbs === samples.map(s => math.abs(s.toLong)).sum / samples.length)
  }

  test("decodeAudioMeta: audio rows only, fields from real WAV decode") {
    val docs = Seq((1L, "a"), (4L, "b"), (6L, "c")).toDF("doc_id", "text")
    val metas = decodeAudioMeta(mediaFromDocuments(docs))
      .collect().sortBy(_.media_id)
    assert(metas.map(_.media_id).toSeq === Seq(1L, 4L)) // 6 is image kind
    metas.foreach { m =>
      val id = m.media_id
      val n = audioNumSamples(id)
      assert(m.n_bytes === Wav.encodedLength(n))
      assert(m.sample_rate === audioSampleRate && m.channels === 1)
      assert(m.n_samples === n.toLong)
      val expMean = (0 until n).map(i => math.abs(audioSample(id, i).toLong))
        .sum / n
      assert(m.mean_abs === expMean)
    }
  }

  test("sampleFrames: every-Nth real movi chunk, video only") {
    val avi = Avi.encodeSolid(4, 2, Array(1, 2, 3, 4, 5)) // 5 frames, 24 B each
    val png = Png.encodeSolid(3, 3, 1, 2, 3)
    val out = sampleFrames(media((1L, "video", avi), (2L, "image", png)),
      everyN = 2).collect().sortBy(_.frame_idx)
    assert(out.map(_.media_id).distinct === Array(1L))
    assert(out.map(_.frame_idx) === Array(0, 2, 4))
    assert(out.map(_.n_bytes).distinct === Array(4 * 2 * 3))
    val all = sampleFrames(media((1L, "video", avi)), everyN = 1).collect()
    assert(all.map(_.frame_idx).sorted.toSeq === Seq(0, 1, 2, 3, 4))
  }

  test("featurize: content-derived descriptors, exact on known media") {
    // image: 8×4 solid (10,20,30) → every 4×4 grid cell nonempty, mean
    // band sum = 60 → 60/768f in all 16 dims
    val png = Png.encodeSolid(8, 4, 10, 20, 30)
    val img = featurize(media((1L, "image", png)), dim = 16).collect().head
    assert(img.feature.toSeq === Seq.fill(16)(60.0f / 768.0f))
    // audio: 32 samples alternating +100/−300 → 16 windows of 2 samples,
    // floor-mean |amp| = 200 → 200/32768f everywhere
    val samples = Array.tabulate(32)(i =>
      (if (i % 2 == 0) 100 else -300).toShort)
    val wav = Wav.encodePcm16Mono(8000, samples)
    val aud = featurize(media((2L, "audio", wav)), dim = 16).collect().head
    assert(aud.feature.toSeq === Seq.fill(16)(200.0f / 32768.0f))
    // video: 8 solid frames filled 0,10,…,70 → resampled curve repeats
    // each frame mean twice, /256f
    val avi = Avi.encodeSolid(4, 2, Array.tabulate(8)(_ * 10))
    val vid = featurize(media((3L, "video", avi)), dim = 16).collect().head
    assert(vid.feature.toSeq === (0 until 16).map(i => (i / 2 * 10) / 256.0f))
    // image grid smaller than dim: g=⌊√8⌋=2 → 4 cells, rest zero-padded
    val small = featurize(media((4L, "image", png)), dim = 8).collect().head
    assert(small.feature.toSeq ===
      Seq.fill(4)(60.0f / 768.0f) ++ Seq.fill(4)(0.0f))
    // deterministic across runs
    val again = featurize(media((3L, "video", avi)), dim = 16).collect().head
    assert(vid.feature.toSeq === again.feature.toSeq)
  }

  test("dHash: decoded-pixel fingerprint matches the arithmetic law") {
    // hand image: 9x8 gradient — sampled luma at (c*w/9, r*h/8) is an
    // exact function of the params, so the expected bits are computable
    val (w, h, base, sx, sy) = (18, 8, 10, 48, 96)
    val png = Png.encodeGradient(w, h, base, sx, sy)
    val got = Png.dHashSampled(png)
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      def lum(cc: Int) =
        3 * Math.floorMod(base + sx * (cc * w / 9) + sy * (r * h / 8), 256)
      if (lum(c) > lum(c + 1)) want |= 1L << (r * 8 + c)
    }
    assert(got === want)
    // a +2 brightness jitter moves the wrap pattern only slightly
    val near = Png.dHashSampled(Png.encodeGradient(w, h, base + 2, sx, sy))
    assert(java.lang.Long.bitCount(got ^ near) <= 6,
      s"jitter moved ${java.lang.Long.bitCount(got ^ near)} bits")
    // a different gradient is far away
    val far = Png.dHashSampled(Png.encodeGradient(w, h, base, 112, 160))
    assert(java.lang.Long.bitCount(got ^ far) > 6)
  }

  test("dHash pair chain: banded Hamming join finds the planted near-dups") {
    // Δ = 3·4096 preserves the gradient class AND the id%3 jitter →
    // ids 7 and 12295 are pixel-identical (hamming 0); Δ = 4096 keeps
    // the class but shifts the jitter → near-dup bytes that differ
    val ids = Seq(7L, 7L + 12288L, 7L + 4096L, 100L, 200L, 300L)
      .toDF("vec_id")
    val sigs = dHashes(gradientImages(ids)).toDF()
    assert(sigs.count() === 6)
    val pairs = graft.operators.NearDup.hammingBandPairs(sigs,
        maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((7L, 7L + 12288L, 0)),
      s"identical-class pair missing from ${pairs.toSeq}")
    // the jittered class member is a REAL near-dup: different bytes
    val m = gradientImages(Seq(7L, 7L + 4096L).toDF("vec_id"))
      .collect().map(r => r.media_id -> r.content).toMap
    assert(!java.util.Arrays.equals(m(7L), m(7L + 4096L)))
  }

  test("envelopeHash: decoded-PCM fingerprint matches the window law") {
    val (n, step, base) = (200, 37, 120)
    val samples =
      Array.tabulate(n)(i => ((base + i * step) % 2001 - 1000).toShort)
    val wav = Wav.encodePcm16Mono(8000, samples)
    val got = Wav.envelopeHash(wav)
    def wm(j: Int): Long = {
      val lo = j * n / 65; val hi = (j + 1) * n / 65
      (lo until hi).map(i => math.abs(samples(i).toLong)).sum / (hi - lo)
    }
    var want = 0L
    for (j <- 0 until 64) if (wm(j) > wm(j + 1)) want |= 1L << j
    assert(got === want)
    // amplitude-offset jitter barely moves the envelope shape
    val near = Wav.envelopeHash(Wav.encodePcm16Mono(8000,
      Array.tabulate(n)(i => ((base + 2 + i * step) % 2001 - 1000).toShort)))
    assert(java.lang.Long.bitCount(got ^ near) <= 6)
  }

  test("curveHash: parsed frame-brightness fingerprint matches the law") {
    val (w, h, nF, step, base) = (4, 3, 40, 57, 30)
    val avi = Avi.encodeSolid(w, h,
      Array.tabulate(nF)(f => (base + f * step) % 256))
    val got = Avi.curveHash(avi)
    def p(j: Int): Long = (base + (j * nF / 65) * step) % 256
    var want = 0L
    for (j <- 0 until 64) if (p(j) > p(j + 1)) want |= 1L << j
    assert(got === want)
    // the planted pair: Δ = 3·4096 preserves class AND jitter for the
    // tone/clip laws too
    val aSigs = envelopeHashes(toneAudio(Seq(11L, 11L + 12288L, 500L)
      .toDF("vec_id"))).collect().map(s => s.id -> s.sig).toMap
    assert(aSigs(11L) === aSigs(11L + 12288L))
    val vSigs = curveHashes(clipVideo(Seq(11L, 11L + 12288L, 500L)
      .toDF("vec_id"))).collect().map(s => s.id -> s.sig).toMap
    assert(vSigs(11L) === vSigs(11L + 12288L))
  }
}
