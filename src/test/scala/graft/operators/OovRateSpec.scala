package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OOV rate under a min-frequency vocab (Vocab.oovRateByGroup):
  * corpus-wide counts decide vocab membership (a token rare in one group
  * but frequent overall is NOT OOV), exact rates on a hand-checked
  * fixture. */
class OovRateSpec extends SparkSpec {
  import spark.implicits._

  test("corpus-wide threshold, per-group rates") {
    // "the" appears 3x corpus-wide (in-vocab at minCount=2) though only
    // once in g2; "rare"/"unique" appear once each (OOV)
    val docs = Seq(
      ("g1", "the cat the dog"),
      ("g1", "rare word word"),
      ("g2", "the unique word"))
      .toDF("src", "text")
    val got = Vocab.oovRateByGroup(docs, col("src"), col("text"), 2L)
      .as[(String, Long, Long, Double)].collect()
      .sortBy(_._1)
    // g1: 7 tokens, oov = rare(1) -> 1/7; counts: the=3, cat=1, dog=1,
    //     rare=1, word=4 (2 in g1 doc2 + 1 g1? recount below)
    // corpus counts: the=3, cat=1, dog=1, rare=1, word=4, unique=1
    // g1 tokens: the,cat,the,dog,rare,word,word = 7; oov: cat,dog,rare = 3
    // g2 tokens: the,unique,word = 3; oov: unique = 1
    assert(got.toSeq === Seq(
      ("g1", 7L, 3L, 0.428571),
      ("g2", 3L, 1L, 0.333333)))
  }

  test("empty docs contribute nothing; all-empty group is absent") {
    val docs = Seq(("g1", "a a"), ("g2", "   "), ("g2", ""))
      .toDF("src", "text")
    val got = Vocab.oovRateByGroup(docs, col("src"), col("text"), 2L)
      .as[(String, Long, Long, Double)].collect()
    assert(got.toSeq === Seq(("g1", 2L, 0L, 0.0)))
  }
}
