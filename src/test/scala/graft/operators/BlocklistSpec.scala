package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Phrase-blocklist matching: whole-word-sequence semantics, occurrence
  * vs distinct counts, case handling, and the broadcast plan shape. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the Big Table was a big table indeed"), // "big table" twice (case-folded)
    (2L, "a classy assembly"),                    // substrings must NOT match "ass"
    (3L, "spam eggs spam"),                       // "spam" twice
    (4L, "nothing to see"),
    (5L, "")
  ).toDF("doc_id", "text")

  private val phrases = Seq("big table", "ass", "spam")

  test("whole-word-sequence matching, occurrences and distinct phrases") {
    val got = Blocklist.phraseHits(docs, col("doc_id"), col("text"), phrases)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((2L, 1L)), 3L -> ((2L, 1L))),
      s"got $got")
  }

  test("a doc matching several phrases counts them distinctly") {
    val got = Blocklist.phraseHits(
        Seq((9L, "spam on the big table")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), phrases)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((9L, 2L, 2L)))
  }

  test("blocklist is broadcast; only matched grams reach the aggregate") {
    val p = Blocklist.phraseHits(docs, col("doc_id"), col("text"), phrases)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"phrase table must broadcast:\n$p")
    intercept[IllegalArgumentException](
      Blocklist.phraseHits(docs, col("doc_id"), col("text"), Seq("  ")))
  }
}
