package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR Gumbel top-k resampling (Dsir.gumbelTopK): exact replay of the
  * deterministic perturbed key (fingerprint-derived uniform → Gumbel →
  * e9-snapped ranking key) on a small fixture, plus the k-per-group and
  * ordering contracts. */
class GumbelTopKSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  private def grams(t: String): Seq[String] = {
    val ts = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (ts.isEmpty) Nil
    else ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }
  private def bucket(g: String): Long = {
    var h = 0L
    g.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
    h % B
  }
  private def poly(t: String): Long = {
    var h = 0L
    t.foreach(c => h = (h * 31 + c.toLong) % 1000000007L)
    h
  }

  private val target = Seq((100L, "alpha beta gamma"), (101L, "alpha beta"))
  private val raw = Seq(
    (1L, "s1", "alpha beta gamma delta"),
    (2L, "s1", "delta epsilon zeta"),
    (3L, "s1", "alpha alpha beta"),
    (4L, "s2", "omega psi chi"),
    (5L, "s2", "alpha beta beta gamma"))

  private def refKeys(): Map[Long, Long] = {
    val tc = target.flatMap(d => grams(d._2)).groupBy(bucket)
      .view.mapValues(_.size.toLong).toMap
    val rc = raw.flatMap(d => grams(d._3)).groupBy(bucket)
      .view.mapValues(_.size.toLong).toMap
    val nt = tc.values.sum
    val nr = rc.values.sum
    def lr(b: Long): Double =
      math.log(((tc.getOrElse(b, 0L) + 1.0) / (nt + B)) /
        ((rc.getOrElse(b, 0L) + 1.0) / (nr + B)))
    raw.map { case (id, _, t) =>
      val logw = BigDecimal(grams(t).map(g => lr(bucket(g))).sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val u = ((poly(t) % 999983L).toDouble + 0.5) / 999983.0
      id -> math.round((logw - math.log(-math.log(u))) * 1e9)
    }.toMap
  }

  private def run(k: Int) = Dsir.gumbelTopK(
    raw.toDF("doc_id", "source", "text"),
    target.toDF("doc_id", "text").select(col("doc_id"), col("text")),
    col("doc_id"), col("text"), col("source"), buckets = B, k = k)
    .as[(String, Int, Long, Double)].collect()

  test("perturbed keys replay the definition exactly") {
    val keys = refKeys()
    val got = run(k = 10)
    assert(got.length === raw.length) // k >= group size: everything kept
    got.foreach { case (_, _, id, key) =>
      val exp = BigDecimal(keys(id).toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(key === exp, s"doc $id")
    }
  }

  test("k per group, ranked by descending key with doc_id tiebreak") {
    val keys = refKeys()
    val got = run(k = 2)
    val byGroup = got.groupBy(_._1)
    assert(byGroup("s1").length === 2 && byGroup("s2").length === 2)
    byGroup.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      val ks = sorted.map(r => keys(r._3))
      assert(ks.zip(ks.tail).forall { case (a, b) => a >= b })
    }
    // the s1 winner pair must be the top-2 keys among s1 docs
    val s1Expected = raw.filter(_._2 == "s1").map(r => (keys(r._1), r._1))
      .sortBy { case (k2, id) => (-k2, id) }.take(2).map(_._2).toSet
    assert(byGroup("s1").map(_._3).toSet === s1Expected)
  }
}
