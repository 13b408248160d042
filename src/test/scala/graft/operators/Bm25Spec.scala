package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 retrieval invariants. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple apple apple"),
    (3L, "apple banana"),
    (4L, "durian elderberry fig grape hackberry imbe jackfruit kiwi"),
    (5L, "banana banana banana banana banana banana banana banana"),
    (6L, "")).toDF("id", "text")

  private def ranks(q: Seq[(String, Seq[String])], k: Int = 6) =
    Bm25.topK(docs, col("id"), col("text"), q, k = k)
      .select("query_id", "rank", "doc_id", "score")
      .as[(String, Int, Long, Double)].collect()

  test("rarer term outranks common term at equal tf and dl") {
    // doc 1 has tf=1 for both "cherry" (df=1) and "apple" (df=3): same
    // doc, same tf, same length — only idf differs, so rare must win
    val out = ranks(Seq("rare" -> Seq("cherry"), "common" -> Seq("apple")))
    val rare = out.filter(r => r._1 == "rare" && r._3 == 1L).head._4
    val common = out.filter(r => r._1 == "common" && r._3 == 1L).head._4
    assert(rare > common, s"rare-term score $rare vs common $common")
  }

  test("tf saturates: 4x term count does not give 4x score") {
    val out = ranks(Seq("q" -> Seq("apple")))
    val tf1 = out.filter(r => r._3 == 3L).head._4 // "apple banana", tf=1
    val tf4 = out.filter(r => r._3 == 2L).head._4 // tf=4 (dl=4 vs 2)
    assert(tf4 > tf1, "more occurrences must not score lower")
    assert(tf4 < 4 * tf1, s"BM25 must saturate: tf4=$tf4 tf1=$tf1")
  }

  test("zero-match docs score 0 and rank after matches, ties by id") {
    val out = ranks(Seq("q" -> Seq("cherry")))
    assert(out.filter(_._3 == 1L).head._2 === 1) // only doc with cherry
    val zeros = out.filter(_._4 == 0.0).sortBy(_._2)
    assert(zeros.map(_._3).toSeq === zeros.map(_._3).sorted.toSeq,
      "zero-score ties must order by doc id")
  }

  test("multi-term score is the sum of its single-term scores") {
    val both = ranks(Seq("ab" -> Seq("apple", "banana")))
      .filter(_._3 == 3L).head._4
    val a = ranks(Seq("a" -> Seq("apple"))).filter(_._3 == 3L).head._4
    val b = ranks(Seq("b" -> Seq("banana"))).filter(_._3 == 3L).head._4
    assert(math.abs(both - (a + b)) < 2e-4, s"$both vs ${a + b}")
  }

  test("k bounds the output per query") {
    val out = ranks(Seq("q1" -> Seq("apple"), "q2" -> Seq("banana")), k = 2)
    assert(out.groupBy(_._1).forall(_._2.length == 2))
    assert(out.forall(_._2 <= 2))
  }
}
