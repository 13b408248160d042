package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Interpolated Kneser–Ney bigram scoring: the exact formula against an
  * independent in-memory reference, the probability-mass invariant that
  * justifies the formula, and cache hygiene. */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private val D = 0.75

  private val docs = Seq(
    (1L, "a b c a b"),
    (2L, "b c d"),
    (3L, "a c"),
    (4L, "x"), // single token: no bigrams, excluded
    (5L, "")   // empty: excluded
  ).toDF("doc_id", "text")

  private def round4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // independent reference: plain Scala maps, no Spark
  private def tokensOf(t: String): Seq[String] =
    t.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  private lazy val corpus: Map[Long, Seq[String]] = Map(
    1L -> tokensOf("a b c a b"), 2L -> tokensOf("b c d"),
    3L -> tokensOf("a c"), 4L -> tokensOf("x"), 5L -> Seq.empty)

  private lazy val pairList: Seq[(Long, (String, String))] =
    corpus.toSeq.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.size == 2).map(p => (id, (p(0), p(1)))).toSeq
    }
  private lazy val c: Map[(String, String), Long] =
    pairList.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
  private lazy val cl: Map[String, Long] =
    c.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
  private lazy val n1l: Map[String, Int] =
    c.groupBy(_._1._1).map { case (l, m) => l -> m.size }
  private lazy val n1r: Map[String, Int] =
    c.groupBy(_._1._2).map { case (r, m) => r -> m.size }

  private def pKn(l: String, r: String): Double =
    math.max(c.getOrElse((l, r), 0L) - D, 0.0) / cl(l) +
      D * n1l(l) / cl(l) * (n1r.getOrElse(r, 0).toDouble / c.size)

  test("reference sanity: P(.|l) sums to 1 over the continuation vocab") {
    // the discounted mass exactly funds the continuation distribution —
    // the identity that makes interpolated KN a probability model
    for (l <- cl.keys) {
      // keys.toSeq: mapping a Set would collapse EQUAL probabilities
      val mass = n1r.keys.toSeq.map(r => pKn(l, r)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context $l mass $mass")
    }
  }

  test("kneserNeyNll matches the independent reference per doc") {
    val got = Vocab.kneserNeyNll(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll")))).toMap
    val expect = pairList.groupBy(_._1).map { case (id, ps) =>
      val lls = ps.map { case (_, (l, r)) => math.log(pKn(l, r)) }
      id -> ((ps.size.toLong, round4(-lls.sum / ps.size)))
    }
    assert(got === expect)
    assert(!got.contains(4L) && !got.contains(5L))
  }

  test("a doc of pure boilerplate collocations scores better than shuffled text") {
    // fluency direction check: seen-order bigrams beat never-seen ones
    val fluent = Seq((100L, "a b c a b c a b c"), (101L, "c a c b b a"))
      .toDF("doc_id", "text")
    val all = docs.select(col("doc_id"), col("text"))
      .union(fluent)
    val nll = Vocab.kneserNeyNll(all, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("avg_nll"))
      .toMap
    assert(nll(100L) < nll(101L),
      s"in-distribution doc must score lower NLL: ${nll(100L)} vs ${nll(101L)}")
  }

  test("kneserNeyNll leaves no cached state behind") {
    Vocab.kneserNeyNll(docs, col("doc_id"), col("text")).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.keySet}")
  }
}
