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

  test("rm3: expansion retrieves vocabulary the original query missed") {
    import spark.implicits._
    // docs 1-2 match "solar" and also speak of "panels"; doc 3 says
    // ONLY "panels panels panels" — invisible to plain BM25 for
    // "solar", reachable once feedback mines "panels"
    val docs = Seq(
      (1L, "solar power solar panels energy"),
      (2L, "solar energy panels grid"),
      (3L, "panels panels panels"),
      (4L, "weather report rain"),
      (5L, "stock market news")
    ).toDF("doc_id", "text")
    val q = Seq("s" -> Seq("solar"))
    val plain = Bm25.topK(docs, col("doc_id"), col("text"), q, k = 5)
      .filter(col("score") > 0)
      .select("doc_id").as[Long].collect().toSet
    assert(!plain.contains(3L), "plain BM25 must not score doc 3")
    val rm3 = Bm25.rm3TopK(docs, col("doc_id"), col("text"), q,
        fbDocs = 2, fbTerms = 3, alpha = 0.5, k = 5)
      .filter(col("score") > 0)
      .select("doc_id").as[Long].collect().toSet
    assert(rm3.contains(3L), s"expansion must surface doc 3, got $rm3")
    assert(!rm3.contains(4L) && !rm3.contains(5L),
      "unrelated docs must stay unscored")
  }

  test("rm3: alpha=1 keeps the original ranking; no-feedback degrades") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple pie recipe"), (2L, "apple orchard"),
      (3L, "banana bread"), (4L, "car engine")
    ).toDF("doc_id", "text")
    val q = Seq("a" -> Seq("apple"))
    val plain = Bm25.topK(docs, col("doc_id"), col("text"), q, k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val a1 = Bm25.rm3TopK(docs, col("doc_id"), col("text"), q,
        fbDocs = 2, fbTerms = 3, alpha = 1.0, k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    // alpha=1: only the original term scores; ranked docs must come
    // back in plain-BM25 order (score scale differs by the 1/|Q| and
    // snap, order must not)
    assert(a1.map(_._2).toSeq === plain.map(_._2).toSeq.take(a1.length))
    // a query whose term is absent everywhere has no positive feedback
    // and must return empty, not throw
    val none = Bm25.rm3TopK(docs, col("doc_id"), col("text"),
      Seq("z" -> Seq("zzz")), fbDocs = 2, fbTerms = 3, alpha = 0.5, k = 4)
    assert(none.count() === 0)
    intercept[IllegalArgumentException](Bm25.rm3TopK(docs, col("doc_id"),
      col("text"), q, alpha = 1.5))
  }

  test("ql: hand-checked Dirichlet score; smoothing keeps non-matching " +
    "docs finite and below matches") {
    val got = Bm25.qlTopK(docs, col("id"), col("text"),
        Seq("q" -> Seq("apple")), mu = 10.0, k = 6)
      .as[(String, Int, Long, Double)].collect().sortBy(_._2)
    // |C| = 25, cf(apple) = 6, p = 6/25; doc2: tf 4, dl 4 →
    // ln((4 + 10·6/25) / (4 + 10))
    val p = 6.0 / 25.0
    val d2 = math.rint(math.log((4.0 + 10.0 * p) / 14.0) * 1e4) / 1e4
    assert(got.find(_._3 == 2L).get._4 === d2)
    // doc2 (dense apple) ranks first; docs 4/5/6 (tf 0) score the pure
    // smoothed mass — finite, ordered by length (shorter dl scores higher)
    assert(got.head._3 === 2L)
    val d6 = math.rint(math.log((0.0 + 10.0 * p) / 10.0) * 1e4) / 1e4
    assert(got.find(_._3 == 6L).get._4 === d6)
    assert(got.find(_._3 == 6L).get._4 > got.find(_._3 == 5L).get._4)
  }

  test("ql: collection-absent terms contribute nothing; length " +
    "normalization separates equal tf") {
    val withOov = Bm25.qlTopK(docs, col("id"), col("text"),
      Seq("q" -> Seq("banana", "zzznope")), mu = 10.0, k = 6)
      .as[(String, Int, Long, Double)].collect().toSet
    val without = Bm25.qlTopK(docs, col("id"), col("text"),
      Seq("q" -> Seq("banana")), mu = 10.0, k = 6)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(withOov === without)
    // docs 1 and 3 both have tf(banana)=1; shorter doc 3 must score higher
    val r = without.toSeq.sortBy(_._2)
    assert(r.indexWhere(_._3 == 3L) < r.indexWhere(_._3 == 1L))
    intercept[IllegalArgumentException](Bm25.qlTopK(docs, col("id"),
      col("text"), Seq("q" -> Seq("a")), mu = 0.0))
  }
}
