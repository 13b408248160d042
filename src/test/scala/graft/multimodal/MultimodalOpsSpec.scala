package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing: typed Dataset shapes, stub codec determinism,
  * frame-sampling arithmetic, feature vectors feeding similarity ops. */
class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._
  import MultimodalOps._

  private def media(rows: (Long, String, String)*): org.apache.spark.sql.Dataset[MediaRow] =
    rows.map { case (id, kind, text) =>
      MediaRow(id, kind, text.getBytes("UTF-8"))
    }.toDS()

  test("decodeMeta: deterministic stub stats per payload") {
    val out = decodeMeta(media((1L, "image", "abcd"))).collect()
    assert(out.length === 1)
    val m = out.head
    assert(m.n_bytes === 4)
    assert(m.width === (4 * 7919) % 1920 + 1)
    assert(m.height === (4 * 104729) % 1080 + 1)
    assert(m.mean_code === ('a' + 'b' + 'c' + 'd').toLong / 4)
  }

  test("sampleFrames: every-Nth fixed-size slice, video only") {
    val text = "x" * 1000 // 1000 bytes → 4 frames of ≤256
    val out = sampleFrames(media((1L, "video", text), (2L, "image", text)),
      everyN = 2).collect().sortBy(_.frame_idx)
    assert(out.map(_.media_id).distinct === Array(1L))
    assert(out.map(_.frame_idx) === Array(0, 2))
    assert(out.map(_.n_bytes) === Array(256, 256)) // frame 2 starts at 512
    // last (unsampled) frame would be the 232-byte tail: 1000 - 3*256
    val all = sampleFrames(media((1L, "video", text)), everyN = 1).collect()
    assert(all.map(_.n_bytes).toSeq === Seq(256, 256, 256, 232))
  }

  test("featurize: stable vectors usable by similarity search") {
    val a = featurize(media((1L, "image", "abc")), dim = 8).collect().head
    val b = featurize(media((1L, "image", "abc")), dim = 8).collect().head
    assert(a.feature.toSeq === b.feature.toSeq)
    assert(a.feature.length === 8)
    assert(a.feature.forall(f => f >= -1.0f && f <= 1.0f))
  }
}
