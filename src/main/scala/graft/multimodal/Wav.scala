package graft.multimodal

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Real WAV (RIFF/PCM) support for the multimodal audio path, using only
  * the JDK — the same upgrade [[Png]] gave images.
  *
  * `decode` is a genuine codec call: `javax.sound.sampled.AudioSystem`
  * parses the RIFF container and hands back the PCM stream + format;
  * sample rate, channel count, frame count, and mean amplitude all come
  * from decoded samples.
  *
  * `encodePcm16Mono` writes the canonical 44-byte-header WAV, so the byte
  * length is exactly `44 + 2*nSamples` — arithmetic in the sample count,
  * which keeps even the payload SIZE of a real decodable audio file
  * verifiable by a relational oracle.
  */
object Wav {

  /** 16-bit little-endian mono PCM in a canonical RIFF/WAVE container. */
  def encodePcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1)                // audio format: PCM
    buf.putShort(1)                // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)     // byte rate
    buf.putShort(2)                // block align
    buf.putShort(16)               // bits per sample
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Expected `encodePcm16Mono` output size — the oracle-side formula. */
  def encodedLength(nSamples: Int): Int = 44 + 2 * nSamples

  /** REAL audio decode via `javax.sound.sampled`: returns (sampleRate,
    * channels, frames, mean |sample| across all channels, floor division).
    * Mean is over ABSOLUTE amplitudes so it is nonnegative and floor/
    * truncating integer division agree across engines. */
  def decode(content: Array[Byte]): (Int, Int, Long, Long) = {
    val in = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new ByteArrayInputStream(content))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
      val bytes = in.readAllBytes()
      val order =
        if (fmt.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
      val bb = ByteBuffer.wrap(bytes).order(order)
      val n = bytes.length / 2
      var sum = 0L
      var i = 0
      while (i < n) { sum += math.abs(bb.getShort(i * 2).toLong); i += 1 }
      (fmt.getSampleRate.toInt, fmt.getChannels, n.toLong / fmt.getChannels,
        if (n == 0) 0L else sum / n)
    } finally in.close()
  }

  /** `nWin` equal-ish windows over the decoded sample stream: window i
    * covers samples [i·n/nWin, (i+1)·n/nWin) and carries the floor-mean
    * |amplitude| — the envelope curve, pure integer until the caller
    * scales. Empty windows (fewer samples than windows) carry 0. */
  def windowMeanAbs(content: Array[Byte], nWin: Int): Array[Long] = {
    val in = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new ByteArrayInputStream(content))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
      val bytes = in.readAllBytes()
      val order =
        if (fmt.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
      val bb = ByteBuffer.wrap(bytes).order(order)
      val n = bytes.length / 2
      Array.tabulate(nWin) { i =>
        val lo = (i.toLong * n / nWin).toInt
        val hi = ((i + 1).toLong * n / nWin).toInt
        if (hi <= lo) 0L
        else {
          var sum = 0L
          var j = lo
          while (j < hi) { sum += math.abs(bb.getShort(j * 2).toLong); j += 1 }
          sum / (hi - lo)
        }
      }
    } finally in.close()
  }

  /** Envelope difference hash over the REAL decoded PCM stream — the
    * audio analog of [[Png.dHashSampled]]: 65 floor-mean |amplitude|
    * windows ([[windowMeanAbs]]), bit `j` set when window `j` is louder
    * than window `j+1`. Loudness/offset shifts move every sample byte
    * but barely move the envelope SHAPE, so Hamming-close hashes mean
    * perceptually-near-duplicate clips (the chromaprint idea at its
    * cheapest rung — a learned audio embedding would replace the
    * descriptor behind the same 64-bit signature contract). */
  def envelopeHash(content: Array[Byte]): Long = {
    val wm = windowMeanAbs(content, 65)
    var bits = 0L
    var j = 0
    while (j < 64) {
      if (wm(j) > wm(j + 1)) bits |= 1L << j
      j += 1
    }
    bits
  }
}
