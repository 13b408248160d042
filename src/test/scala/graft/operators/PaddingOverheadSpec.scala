package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Padding-overhead audit (Pack.paddingOverhead): invariants (padded ≥
  * real, conservation of real tokens across strategies) plus an exact
  * replay of the batch assignment on a small fixture. */
class PaddingOverheadSpec extends SparkSpec {
  import spark.implicits._

  private val B = 4
  private val W = 8

  private val docs: Seq[(Long, Long)] = // (id, nt)
    (0L until 40L).map(i => (i, (i * 7) % 60 + 1))

  private def lcg(id: Long): Long = (id * 1103515245L + 12345L) % 2147483647L

  private def ref(): Map[String, (Long, Long, Long)] = {
    val n = docs.size
    val nb = math.max(1L, math.ceil(n / B.toDouble).toLong)
    val hashed = docs.groupBy { case (id, _) => lcg(id) % nb }
    val bsizes = docs.groupBy { case (_, nt) => nt / W }
      .view.mapValues(_.size).toMap
    val bucketed = docs.groupBy { case (id, nt) =>
      (nt / W, lcg(id) % math.max(1L, math.ceil(bsizes(nt / W) / B.toDouble).toLong))
    }
    def stat(groups: Iterable[Seq[(Long, Long)]]): (Long, Long, Long) = {
      val real = groups.map(_.map(_._2).sum).sum
      val padded = groups.map(g => g.map(_._2).max * g.size).sum
      (groups.size.toLong, real, padded)
    }
    Map("hashed" -> stat(hashed.values.map(_.toSeq)),
      "bucketed" -> stat(bucketed.values.map(_.toSeq)))
  }

  test("batch assignment and overhead match the definition replay") {
    val got = Pack.paddingOverhead(docs.toDF("doc_id", "nt"),
        col("doc_id"), col("nt"), B, W)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val expect = ref()
    Seq("hashed", "bucketed").foreach { s =>
      val (nb, real, padded) = expect(s)
      val (gnb, greal, gpadded, ratio) = got(s)
      assert((gnb, greal, gpadded) === ((nb, real, padded)), s)
      val expRatio = BigDecimal((padded - real).toDouble / real)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ratio === expRatio, s)
    }
  }

  test("invariants: padded >= real; real identical across strategies") {
    val got = Pack.paddingOverhead(docs.toDF("doc_id", "nt"),
        col("doc_id"), col("nt"), B, W)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.length === 2)
    assert(got.forall(r => r._4 >= r._3))
    assert(got.map(_._3).distinct.length === 1)
  }

  test("truncationLoss: hand-checked shares, null handling, zero-token " +
    "group contract") {
    val df = Seq(
      ("a", Some(10L)), ("a", Some(100L)), ("a", Some(64L)),
      ("a", None), // excluded, not zero-filled
      ("b", Some(0L)), ("b", Some(0L)))
      .toDF("src", "nt")
    val got = Pack.truncationLoss(df, col("src"), col("nt"), seqLen = 64)
      .as[(String, Long, Long, Long, Long, Double, Option[Double])]
      .collect().sortBy(_._1)
    // a: 3 docs, 1 truncated (100 > 64, exactly-64 is NOT), lost 36
    assert(got(0) === (("a", 3L, 1L, 174L, 36L, 0.333333, Some(0.206897))))
    // b: all-zero tokens → lost_share null, not 0/0
    assert(got(1) === (("b", 2L, 0L, 0L, 0L, 0.0, None)))
    intercept[IllegalArgumentException](
      Pack.truncationLoss(df, col("src"), col("nt"), seqLen = 0))
  }
}
