package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-document segment dedup: first-occurrence-wins semantics, exact
  * rebuild from kept segments, and the degenerate shapes. */
class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], w: Int) =
    Dedup.dedupSegments(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), w)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("a repeated segment survives only at its first (doc_id, pos)") {
    // w=2 segments: doc 1 = [a b][c d], doc 2 = [a b][x y] — doc 2 loses
    // its copy of [a b] but keeps [x y]
    assert(run(Seq(1L -> "a b c d", 2L -> "a b x y"), 2) === Seq(
      (1L, 2L, 2L, "a b c d"), (2L, 2L, 1L, "x y")))
  }

  test("within-doc repeats collapse to the earliest position") {
    // doc 1 = [a b][a b][c d]: pos 1's copy drops, rebuild keeps order
    assert(run(Seq(1L -> "a b a b c d"), 2) ===
      Seq((1L, 3L, 2L, "a b c d")))
  }

  test("first occurrence is by (doc_id, pos), not text order") {
    // the shared segment sits at pos 1 in doc 1 and pos 0 in doc 2: doc 1
    // wins because its doc_id is smaller, even though its pos is larger
    assert(run(Seq(1L -> "x y a b", 2L -> "a b q r"), 2) === Seq(
      (1L, 2L, 2L, "x y a b"), (2L, 2L, 1L, "q r")))
  }

  test("a doc whose every segment is seen earlier rebuilds to empty") {
    assert(run(Seq(1L -> "a b c d", 2L -> "a b", 3L -> "c d a b"), 2) === Seq(
      (1L, 2L, 2L, "a b c d"), (2L, 1L, 0L, ""), (3L, 2L, 0L, "")))
  }

  test("short tail segment is its own dedup unit") {
    // w=3: doc 1 = [a b c][d], doc 2 = [d] — doc 2's whole text is doc 1's
    // tail segment, so it drops; doc 3 = [d e f] is a DIFFERENT segment
    assert(run(Seq(1L -> "a b c d", 2L -> "d", 3L -> "d e f"), 3) === Seq(
      (1L, 2L, 2L, "a b c d"), (2L, 1L, 0L, ""), (3L, 1L, 1L, "d e f")))
  }

  test("empty and whitespace-only docs keep their row with zero segments") {
    assert(run(Seq(1L -> "", 2L -> "   ", 3L -> "a b"), 2) === Seq(
      (1L, 0L, 0L, ""), (2L, 0L, 0L, ""), (3L, 1L, 1L, "a b")))
  }

  test("whitespace is normalized identically on both sides of the rebuild") {
    // irregular separators: tokens(text) trims + splits on \s+, rebuild
    // joins with single spaces — same normalization the oracle applies
    assert(run(Seq(1L -> "  a   b\tc d  "), 2) ===
      Seq((1L, 2L, 2L, "a b c d")))
  }

  // ------------------------------------ frequency-threshold segment drop

  private def runDf(docs: Seq[(Long, String)], w: Int, minDf: Int) =
    Dedup.dropFrequentSegments(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), w, minDf)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("a segment in >= minDf docs is dropped from EVERY doc, " +
    "including the first") {
    // [a b] occurs in docs 1 and 2 → boilerplate, no survivor anywhere
    assert(runDf(Seq(1L -> "a b c d", 2L -> "a b x y"), 2, 2) === Seq(
      (1L, 2L, 1L, "c d"), (2L, 2L, 1L, "x y")))
  }

  test("document frequency is DISTINCT docs — within-doc repeats " +
    "do not reach the threshold") {
    // [a b] twice in doc 1 only: df = 1 < 2, both copies survive
    assert(runDf(Seq(1L -> "a b a b", 2L -> "x y"), 2, 2) === Seq(
      (1L, 2L, 2L, "a b a b"), (2L, 1L, 1L, "x y")))
  }

  test("minDf = 3 spares a two-doc segment") {
    assert(runDf(Seq(1L -> "a b", 2L -> "a b", 3L -> "a b"), 2, 3) === Seq(
      (1L, 1L, 0L, ""), (2L, 1L, 0L, ""), (3L, 1L, 0L, "")))
    assert(runDf(Seq(1L -> "a b", 2L -> "a b", 3L -> "x y"), 2, 3) === Seq(
      (1L, 1L, 1L, "a b"), (2L, 1L, 1L, "a b"), (3L, 1L, 1L, "x y")))
  }

  test("empty docs keep their row; thresholds below 2 are rejected") {
    assert(runDf(Seq(1L -> "", 2L -> "a b"), 2, 2) === Seq(
      (1L, 0L, 0L, ""), (2L, 1L, 1L, "a b")))
    intercept[IllegalArgumentException] {
      Dedup.dropFrequentSegments(Seq(1L -> "a").toDF("doc_id", "text"),
        col("doc_id"), col("text"), w = 2, minDf = 1)
    }
  }
}
