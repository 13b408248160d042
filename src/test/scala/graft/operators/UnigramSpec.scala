package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram Viterbi: known segmentations, char fallback, determinism. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("the" -> -2500000L, "th" -> -3000000L,
    "he" -> -3200000L, "e" -> -3900000L)
  private val charScore = -4200000L

  private def nll(textRows: (Long, String)*): Map[Long, (Long, Long)] =
    Vocab.unigramNll(textRows.toSeq.toDF("id", "text"), col("id"),
      col("text"), vocab, charScore)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("whole-word piece beats char and sub-piece segmentations") {
    // 'the' as one piece: 2500000, NOT th+e (3000000+3900000) or chars
    assert(nll(1L -> "the") === Map(1L -> (1L, 2500000L)))
  }

  test("DP composes pieces across the word") {
    // 'thethe' = the+the
    assert(nll(1L -> "thethe")(1L) === (1L, 5000000L))
    // 'xthe' = char + the
    assert(nll(2L -> "xthe")(2L) === (1L, 2500000L + 4200000L))
  }

  test("out-of-vocab words fall back to per-char scores") {
    assert(nll(1L -> "zzzz")(1L) === (1L, 4L * 4200000L))
  }

  test("per-doc sum over tokens; duplicate types share one DP result") {
    val out = nll(1L -> "the the zz")
    assert(out(1L) === (3L, 2500000L + 2500000L + 2L * 4200000L))
  }

  test("deterministic under repartitioning") {
    val docs = (1L to 50L).map(i => i -> s"the w$i thethe zz")
    val a = nll(docs: _*)
    val b = Vocab.unigramNll(docs.toDF("id", "text").repartition(7),
      col("id"), col("text"), vocab, charScore)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(a === b)
  }
}
