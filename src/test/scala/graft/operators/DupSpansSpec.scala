package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact duplicated n-gram span statistics (Dedup.dupNgramSpans). */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  // w0..w9 is a 10-token doc; docs 1 and 2 share their full text (every
  // 4-gram duplicated); doc 3 shares only the first 4 tokens with them;
  // doc 4 is unique; doc 5 is shorter than k; doc 6 repeats a window
  // WITHIN itself (self-duplication counts, per Lee et al.).
  private lazy val docs = Seq(
    (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
    (2L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
    (3L, "w0 w1 w2 w3 x4 x5 x6 x7 x8 x9"),
    (4L, "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9"),
    (5L, "v0 v1 v2"),
    (6L, "a0 a1 a2 a3 z0 z1 a0 a1 a2 a3")).toDF("id", "text")

  private def run(k: Int) =
    Dedup.dupNgramSpans(docs, col("id"), col("text"), k)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("full-dup, partial-overlap, unique, short, and self-dup docs") {
    val m = run(4)
    // 10 tokens → 7 grams. Docs 1/2: all 7 grams duplicated, 10 covered.
    assert(m(1L) === ((10L, 7L, 7L, 10L)))
    assert(m(2L) === ((10L, 7L, 7L, 10L)))
    // Doc 3 shares only gram "w0 w1 w2 w3" (pos 0) → 4 tokens covered.
    assert(m(3L) === ((10L, 7L, 1L, 4L)))
    // Doc 4: nothing shared.
    assert(m(4L) === ((10L, 7L, 0L, 0L)))
    // Doc 5: shorter than k → no grams, zero everything.
    assert(m(5L) === ((3L, 0L, 0L, 0L)))
    // Doc 6: "a0 a1 a2 a3" occurs at pos 0 and pos 6 of the SAME doc →
    // self-duplicated, covering tokens 0-3 and 6-9 (8 positions).
    assert(m(6L) === ((10L, 7L, 2L, 8L)))
  }

  test("coverage union merges overlapping spans, not double-counts") {
    // One 12-token doc sharing tokens 0..8 with another: duplicated grams
    // at pos 0..5 (six overlapping 4-gram windows) must cover 9 distinct
    // positions, not 6*4=24.
    val d2 = Seq(
      (1L, "s0 s1 s2 s3 s4 s5 s6 s7 s8 q9 qa qb"),
      (2L, "s0 s1 s2 s3 s4 s5 s6 s7 s8 r9 ra rb")).toDF("id", "text")
    val m = Dedup.dupNgramSpans(d2, col("id"), col("text"), 4)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    assert(m(1L) === ((6L, 9L)))
    assert(m(2L) === ((6L, 9L)))
  }

  test("empty and whitespace-only docs yield zero rows with zero counts") {
    val d3 = Seq((1L, ""), (2L, "   "), (3L, "w0 w1 w2 w3 w4")).toDF("id", "text")
    val m = Dedup.dupNgramSpans(d3, col("id"), col("text"), 4)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(m(1L) === ((0L, 0L, 0L, 0L)))
    assert(m(2L) === ((0L, 0L, 0L, 0L)))
    assert(m(3L) === ((5L, 2L, 0L, 0L)))
  }

  // ----------------------------------------- span REMOVAL (removeDupSpans)

  private def runRemove(k: Int) =
    Dedup.removeDupSpans(docs, col("id"), col("text"), k)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("one copy of every duplicated passage survives — the corpus-first") {
    val m = runRemove(4)
    // doc 1 is the first occurrence of every shared gram: untouched
    assert(m(1L) === ((10L, 0L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")))
    // doc 2 duplicates doc 1 entirely: every position cut
    assert(m(2L) === ((10L, 10L, "")))
    // doc 3 shares only its first 4-gram → positions 0..3 cut
    assert(m(3L) === ((10L, 4L, "x4 x5 x6 x7 x8 x9")))
    // unique and shorter-than-k docs pass through (whitespace-normalized)
    assert(m(4L) === ((10L, 0L, "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9")))
    assert(m(5L) === ((3L, 0L, "v0 v1 v2")))
    // within-doc repeat: the second [a0 a1 a2 a3] (pos 6..9) is cut
    assert(m(6L) === ((10L, 4L, "a0 a1 a2 a3 z0 z1")))
  }

  test("removal composes with the stats: removed == covered minus " +
    "first-occurrence coverage") {
    // doc 2's n_dup_tokens (coverage incl. first copies) is 10, but the
    // REMOVED count only counts non-first coverage — doc 1 keeps its 10
    val stats = run(4)
    val rem = runRemove(4)
    assert(stats(1L)._4 === 10L && rem(1L)._2 === 0L)
    assert(stats(2L)._4 === 10L && rem(2L)._2 === 10L)
  }

  test("empty docs keep a row with empty text") {
    val d3 = Seq((1L, ""), (2L, "w0 w1 w2 w3")).toDF("id", "text")
    val m = Dedup.removeDupSpans(d3, col("id"), col("text"), 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(1L) === ((0L, 0L, "")))
    assert(m(2L) === ((4L, 0L, "w0 w1 w2 w3")))
  }
}
