package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus n-gram diversity (Diversity.ngramDiversity): hand-computable
  * totals/distincts per group and n, slide (not shingle-set) semantics. */
class DiversitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    ("A", "a b a b"),   // uni 4/2; bi [a b][b a][a b] 3/2; tri 2/2
    ("A", "a b"),       // uni +2/+0 distinct; bi +1 ([a b]); no tri
    ("B", "x"),         // uni 1/1; nothing at n >= 2
    ("C", "")           // contributes nothing anywhere
  ).toDF("src", "text")

  private def run(ns: Seq[Int]) =
    Diversity.ngramDiversity(docs, col("text"), col("src"), ns)
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("totals count every occurrence; distincts collapse repeats") {
    val m = run(Seq(1, 2, 3))
    assert(m(("A", 1)) === ((6L, 2L, round6(2.0 / 6))))
    assert(m(("A", 2)) === ((4L, 2L, round6(2.0 / 4))))
    assert(m(("A", 3)) === ((2L, 2L, 1.0)))
    assert(m(("B", 1)) === ((1L, 1L, 1.0)))
    // B has no bigrams, C no tokens: absent rather than zero-divided
    assert(!m.contains(("B", 2)) && !m.contains(("C", 1)))
    assert(m.size === 4)
  }

  test("a template-flooded group scores lower diversity than a varied one") {
    val corpus = (1 to 50).map(i => ("tpl", "click here to continue now")) ++
      (1 to 50).map(i => ("var", s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e"))
    val m = Diversity.ngramDiversity(corpus.toDF("src", "text"),
        col("text"), col("src"), Seq(2))
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(m("tpl") < 0.05 && m("var") === 1.0)
  }

  test("invalid n is rejected") {
    intercept[IllegalArgumentException] {
      Diversity.ngramDiversity(docs, col("text"), col("src"), Seq(0))
    }
    intercept[IllegalArgumentException] {
      Diversity.ngramDiversity(docs, col("text"), col("src"), Nil)
    }
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("lengthHistogram: power-of-two buckets, integer outputs") {
    val d2 = Seq(
      ("A", ""),              // 0 tokens -> bucket 0
      ("A", "t1"),            // 1 token  -> bucket 1
      ("A", "t1 t2 t3"),      // 3 tokens -> bucket 2
      ("A", "t1 t2 t3 t4"),   // 4 tokens -> bucket 3
      ("B", "a b c d e f g h") // 8 tokens -> bucket 4
    ).toDF("src", "text")
    val got = Diversity.lengthHistogram(d2, col("text"), col("src"))
      .as[(String, Int, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got(("A", 0)) === ((1L, 0L, 0L, 0L)))
    assert(got(("A", 1)) === ((1L, 1L, 1L, 1L)))
    assert(got(("A", 2)) === ((1L, 3L, 3L, 3L)))
    assert(got(("A", 3)) === ((1L, 4L, 4L, 4L)))
    assert(got(("B", 4)) === ((1L, 8L, 8L, 8L)))
    assert(got.size === 5)
  }
}
