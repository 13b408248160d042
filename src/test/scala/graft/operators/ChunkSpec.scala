package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token-window chunking: exact windows, overlap, tails, edge cases. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, size: Int, overlap: Int) =
    Chunk.tokenChunks(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), size, overlap)
      .orderBy("chunk_idx")
      .as[(Long, Int, Int, String)].collect().toSeq

  test("non-overlapping windows with a short tail") {
    assert(chunks("a b c d e f g", 3, 0) === Seq(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "d e f"), (1L, 2, 1, "g")))
  }

  test("overlapping windows stride by size - overlap") {
    assert(chunks("a b c d e f g", 4, 2) === Seq(
      (1L, 0, 4, "a b c d"), (1L, 1, 4, "c d e f"), (1L, 2, 3, "e f g")))
  }

  test("doc shorter than one window is a single whole chunk") {
    assert(chunks("a b", 5, 2) === Seq((1L, 0, 2, "a b")))
  }

  test("exact multiple leaves no empty tail chunk") {
    assert(chunks("a b c d", 2, 0) === Seq(
      (1L, 0, 2, "a b"), (1L, 1, 2, "c d")))
    // overlap case: n=5, size=3, stride=2 -> chunks at 0,2: [abc],[cde]
    assert(chunks("a b c d e", 3, 1) === Seq(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "c d e")))
  }

  test("empty and whitespace-only docs yield nothing") {
    val out = Chunk.tokenChunks(
      Seq((1L, ""), (2L, "   "), (3L, "x")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), 4, 1)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out === Seq((3L, 0, 1, "x")))
  }

  test("invalid size/overlap rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Chunk.tokenChunks(df, col("doc_id"), col("text"), 0, 0))
    intercept[IllegalArgumentException](
      Chunk.tokenChunks(df, col("doc_id"), col("text"), 4, 4))
  }

  test("map-side only: no exchange in the plan") {
    val p = Chunk.tokenChunks(Seq((1L, "a b c")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 2, 0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }
}
