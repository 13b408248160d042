package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance weights (Dsir.importanceWeights): checked against an
  * independent in-test reference implementation of the same definition
  * (poly-hash buckets, add-1 smoothed likelihood ratio, ln-sum), plus
  * the row-stability and selection-flag contracts. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // --- reference implementation (definition replayed independently) ---
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
  private def ref(raw: Seq[(Long, String)], target: Seq[(Long, String)])
      : Map[Long, (Long, Double, Boolean)] = {
    val tc = target.flatMap(d => grams(d._2)).groupBy(bucket)
      .view.mapValues(_.size.toLong).toMap
    val rc = raw.flatMap(d => grams(d._2)).groupBy(bucket)
      .view.mapValues(_.size.toLong).toMap
    val nt = tc.values.sum
    val nr = rc.values.sum
    def lr(b: Long): Double =
      math.log(((tc.getOrElse(b, 0L) + 1.0) / (nt + B)) /
        ((rc.getOrElse(b, 0L) + 1.0) / (nr + B)))
    raw.map { case (id, t) =>
      val gs = grams(t)
      val w = BigDecimal(gs.map(g => lr(bucket(g))).sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((gs.size.toLong, w, w > 0.0))
    }.toMap
  }

  private def run(raw: Seq[(Long, String)], target: Seq[(Long, String)]) =
    Dsir.importanceWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), col("doc_id"), col("text"),
        buckets = B)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private val target = Seq(
    100L -> "alpha beta gamma alpha beta",
    101L -> "alpha beta delta epsilon")
  private val raw = Seq(
    1L -> "alpha beta gamma",          // target-like → positive weight
    2L -> "zeta eta theta iota kappa", // disjoint vocab → negative
    3L -> "alpha beta zeta eta",       // mixed
    4L -> "")                          // no grams

  test("weights equal the independent reference implementation") {
    assert(run(raw, target) === ref(raw, target))
  }

  test("target-like docs score positive, disjoint-vocab docs negative") {
    val m = run(raw, target)
    assert(m(1L)._3 === true && m(1L)._2 > 0.0)
    assert(m(2L)._3 === false && m(2L)._2 < 0.0)
  }

  test("docs with no grams keep a zero row, unselected") {
    assert(run(raw, target)(4L) === ((0L, 0.0, false)))
  }

  test("the log-ratio table broadcasts and the raw pool never shuffles " +
    "by gram") {
    val plan = Dsir.importanceWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), col("doc_id"), col("text"), B)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("degenerate configs are rejected") {
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), col("doc_id"), col("text"),
        buckets = 1)
    }
  }
}
