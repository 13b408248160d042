package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Vocab concentration panel (Vocab.concentrationByGroup) and Heaps'-law
  * fit (Vocab.heapsFitByGroup): hand-computed fixtures, the ties-inclusive
  * top-10 cut, and the fit's point replay through Trend.olsByGroup. */
class ConcentrationSpec extends SparkSpec {
  import spark.implicits._

  // counts in s: a=4, b=2, c=2, d=1 → V=4, N=9, hapax=1;
  // ascending ranks (1,2,2,4): Σ rank·c = 1+4+6+16 = 27 →
  // gini = (2·27 − 5·9)/(4·9) = 0.25; all min-ranks ≤ 10 → top10 = 1
  private def docs = Seq(
    (1L, "s", "a a b c"), (2L, "s", "a a b c d")).toDF("id", "src", "text")

  test("panel matches the hand computation on the 4-type fixture") {
    val got = Vocab.concentrationByGroup(docs, col("src"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(got === Set(Seq("s", 4L, 9L, 1L, 0.25, 1.0, 0.25)))
  }

  test("top-10 cut excludes the below-rank-10 tie block; gini exact") {
    // one type ×100, ten types ×2, five types ×1: the cnt=1 block's
    // min-rank is 12 > 10 → excluded whole; V=16, N=125,
    // top_mass = 120/125 = 0.96, hapax = 5/16 = 0.3125,
    // 2Σ rank·c = 30 + 420 + 3200 = 3650 →
    // gini = (3650 − 17·125)/(16·125) = 0.7625
    val text = (Seq.fill(100)("big") ++
      (1 to 10).flatMap(i => Seq.fill(2)(s"mid$i")) ++
      (1 to 5).map(i => s"one$i")).mkString(" ")
    val df = Seq((1L, "g", text)).toDF("id", "src", "text")
    val got = Vocab.concentrationByGroup(df, col("src"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(got === Set(Seq("g", 16L, 125L, 5L, 0.3125, 0.96, 0.7625)))
  }

  test("entropy replays the exact snapped-ln sequence; uniform corpus " +
    "has eff_vocab = n_types") {
    def snap6(x: Double) = math.round(math.log(x) * 1e6)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // counts a=4, b=2, c=2, d=1: s6 = 4·ln4 + 4·ln2 (snapped), N=9
    val s6 = 4L * snap6(4.0) + 2L * 2L * snap6(2.0) + 1L * snap6(1.0)
    val h = math.log(9.0) - s6 / 1e6 / 9.0
    val got = Vocab.entropyByGroup(docs, col("src"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(got === Set(Seq("s", 9L, 4L, r6(h), r6(math.exp(h)))))
    // perfectly uniform usage: H = ln V exactly, eff_vocab = V
    val uni = Seq((1L, "u", "p q r s")).toDF("id", "src", "text")
    val g2 = Vocab.entropyByGroup(uni, col("src"), col("text"))
      .collect().head
    assert(g2.getDouble(4) === 4.0 &&
      g2.getDouble(3) === r6(math.log(4.0)))
  }

  test("heaps fit equals the hand-built (ln N, ln V) point replay") {
    def snap(v: Double) = math.round(math.log(v) * 1e6)
    val two = Seq(
      (1L, "g1", "a b c"),                 // V=3, N=3
      (2L, "g2", "a a b b c c d d")        // V=4, N=8
    ).toDF("id", "src", "text")
    val pts = Seq(
      ("all", snap(3.0), snap(3.0)),
      ("all", snap(8.0), snap(4.0))).toDF("g", "x", "y")
    val expect = Trend.olsByGroup(pts, col("g"), col("x"), col("y"))
      .collect().map(_.toSeq).toSet
    val got = Vocab.heapsFitByGroup(two, col("src"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(got === expect)
    // β for these two points: Δln V / Δln N = ln(4/3)/ln(8/3) ≈ 0.293
    val beta = got.head(4).asInstanceOf[Double]
    assert(beta > 0.29 && beta < 0.30)
  }
}
