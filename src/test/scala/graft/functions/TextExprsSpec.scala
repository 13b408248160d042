package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text-analysis expression edge cases (§2.10). */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private def eval[T](c: Column): T =
    spark.range(1).select(c).collect().head.getAs[T](0)

  test("tokens: empty and whitespace-only input → empty array") {
    assert(eval[Int](size(TextExprs.tokens(lit("")))) === 0)
    assert(eval[Int](size(TextExprs.tokens(lit("   ")))) === 0)
    assert(eval[Int](size(TextExprs.tokens(lit("a  b\tc")))) === 3)
  }

  test("wordShingles: empty doc → empty set; short doc → single shingle") {
    assert(eval[Int](size(TextExprs.wordShingles(lit(""), 3))) === 0)
    assert(eval[Seq[String]](TextExprs.wordShingles(lit("a b"), 3)) === Seq("a b"))
    assert(eval[Seq[String]](TextExprs.wordShingles(lit("a b c d"), 3)) ===
      Seq("a b c", "b c d"))
  }

  test("wordShingles deduplicates repeated shingles") {
    assert(eval[Seq[String]](TextExprs.wordShingles(lit("x y x y x y"), 2)) ===
      Seq("x y", "y x"))
  }

  test("punct/alpha ratios") {
    assert(eval[Double](TextExprs.punctRatio(lit("ab,.") )) === 0.5)
    assert(eval[Double](TextExprs.alphaRatio(lit("ab12"))) === 0.5)
  }

  test("polyFingerprint is deterministic and order-sensitive") {
    val a = eval[Long](TextExprs.polyFingerprint(lit("abc")))
    val b = eval[Long](TextExprs.polyFingerprint(lit("acb")))
    val a2 = eval[Long](TextExprs.polyFingerprint(lit("abc")))
    assert(a === a2)
    assert(a !== b)
    // hand-computed: ((97*31 + 98)*31 + 99) % 1e9+7
    assert(a === ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("langIdGuess picks the stopword-dominant language") {
    assert(eval[String](TextExprs.langIdGuess(
      lit("the cat sat on the mat and it is warm"))) === "en")
    assert(eval[String](TextExprs.langIdGuess(
      lit("el perro y el gato en la casa que los"))) === "es")
    assert(eval[String](TextExprs.langIdGuess(
      lit("der hund und die katze ist ein tier"))) === "de")
  }
}
