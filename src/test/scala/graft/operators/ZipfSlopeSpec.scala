package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zipf rank-frequency fit (Vocab.zipfSlopeByGroup): point law replay,
  * frequency-scale invariance of the slope, degenerate contract. */
class ZipfSlopeSpec extends SparkSpec {
  import spark.implicits._

  // counts: a=4, b=2, c=2, d=1 → distinct freqs 4,2,1 with min-ranks
  // 1, 2, 4
  private def docs = Seq(
    (1L, "s", "a a b c"), (2L, "s", "a a b c d")).toDF("id", "src", "text")

  test("fit equals the hand-built (ln min-rank, ln freq) point replay") {
    def snap(v: Double) = math.round(v * 1e6)
    val pts = Seq(
      ("s", snap(math.log(1.0)), snap(math.log(4.0))),
      ("s", snap(math.log(2.0)), snap(math.log(2.0))),
      ("s", snap(math.log(4.0)), snap(math.log(1.0))))
      .toDF("src", "x", "y")
    val expect = Trend.olsByGroup(pts, col("src"), col("x"), col("y"))
      .collect().map(_.toSeq).toSet
    val got = Vocab.zipfSlopeByGroup(docs, col("src"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(got === expect)
    val slope = got.head(4).asInstanceOf[Double]
    assert(slope < 0.0 && slope > -1.5)
  }

  test("slope is invariant to duplicating the corpus (counts x2); " +
    "single-frequency groups return null slope") {
    val doubled = docs.unionByName(docs.withColumn("id", col("id") + 10L))
    val s1 = Vocab.zipfSlopeByGroup(docs, col("src"), col("text"))
      .select("slope").as[Double].collect().head
    val s2 = Vocab.zipfSlopeByGroup(doubled, col("src"), col("text"))
      .select("slope").as[Double].collect().head
    // invariance holds up to the 1e-6 ln snap grain (each point's ln 2
    // shift snaps independently), not bit-exactly
    assert(math.abs(s1 - s2) < 1e-5)
    // every token appears exactly once → one distinct frequency → one
    // point → zero x-variance → null slope by the Trend contract
    val flat = Seq((1L, "f", "p q r")).toDF("id", "src", "text")
    val got = Vocab.zipfSlopeByGroup(flat, col("src"), col("text"))
      .collect().head
    assert(got.get(4) == null)
  }
}
