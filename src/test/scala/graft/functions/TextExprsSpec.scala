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

  test("gopherFlags: each rule fires on its own violation") {
    def flags(text: String, minTokens: Int = 2) =
      eval[org.apache.spark.sql.Row](
        TextExprs.gopherFlags(lit(text), minTokens = minTokens))
    // fluent prose passes every rule (minTokens lowered for the fixture;
    // mean token length 39·100/12 = 325 ∈ [300, 1000])
    val ok = flags("the black cat sat on the warm mat and it was there")
    assert(ok.getAs[Boolean]("keep"),
      s"expected all rules to pass: $ok")
    // r_len: one token < minTokens
    assert(!flags("hello").getAs[Boolean]("r_len"))
    // r_wordlen: mean token length 15 chars > 10 (×100 = 1500)
    val long = flags("antidisestablis antidisestablis")
    assert(!long.getAs[Boolean]("r_wordlen"))
    assert(long.getAs[Long]("n_tok") === 2L)
    // r_alpha: >20% numeric tokens
    assert(!flags("1 2 3 4 5 6 7 8 9 0 the a of and")
      .getAs[Boolean]("r_alpha"))
    // r_stop: no stopwords at all
    assert(!flags("lorem ipsum dolor sit amet").getAs[Boolean]("r_stop"))
    // r_distinct: one token repeated (distinct ratio 1/12 < 20%)
    assert(!flags("spam spam spam spam spam spam spam spam spam spam " +
      "spam spam").getAs[Boolean]("r_distinct"))
    // empty text: no rule NULLs out, keep is a definite false
    val empty = flags("   ")
    assert(empty.getAs[Long]("n_tok") === 0L)
    assert(!empty.getAs[Boolean]("keep"))
  }

  test("charEntropy: uniform, constant, and empty cases") {
    // empty -> 0; single repeated char -> 0 (and +0.0, not -0.0)
    assert(eval[Double](TextExprs.charEntropy(lit(""))) === 0.0)
    val zero = eval[Double](TextExprs.charEntropy(lit("aaaa")))
    assert(zero === 0.0 &&
      java.lang.Double.doubleToRawLongBits(zero) == 0L)
    // two chars 50/50 -> ln 2; four chars uniform -> ln 4
    assert(math.abs(eval[Double](TextExprs.charEntropy(lit("abab"))) -
      math.log(2)) < 1e-4)
    assert(math.abs(eval[Double](TextExprs.charEntropy(lit("abcd"))) -
      math.log(4)) < 1e-4)
    // skewed 3:1 -> -(3/4 ln 3/4 + 1/4 ln 1/4)
    val expect = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(eval[Double](TextExprs.charEntropy(lit("aaab"))) -
      expect) < 1e-4)
  }

  test("word-gram kernels are element-identical to the HOF reference " +
    "formulations (order included)") {
    // r18: wordShingles / slideGrams run as one codegen'd kernel; the
    // pre-r18 HOF chains are reconstructed here as the independent
    // reference (the winnowing-kernel parity discipline).
    def shingleRef(text: Column, n: Int): Column = {
      val ts = TextExprs.tokens(text)
      val slide = transform(
        sequence(lit(0), greatest(size(ts) - n, lit(0))),
        i => array_join(slice(ts, i + 1, lit(n)), " "))
      when(size(ts) === 0, array().cast("array<string>"))
        .otherwise(array_distinct(slide))
    }
    def slideRef(text: Column, n: Int): Column = {
      val ts = TextExprs.tokens(text)
      when(size(ts) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(ts) - n),
          i => array_join(slice(ts, i + 1, lit(n)), " ")))
    }
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
      .unionByName(Seq("", "a b", "one two three",
        "x x x x x", "héllo wörld ☃ 𝄞clef tokens here",
        "  padded   whitespace   runs  ").toDF("text"))
    Seq(1, 3, 5).foreach { n =>
      val rows = docs.select(
          TextExprs.wordShingles(col("text"), n).as("sk"),
          shingleRef(col("text"), n).as("sr"),
          graft.functions.TextKernels.slideGrams(
            TextExprs.tokens(col("text")), n).as("gk"),
          slideRef(col("text"), n).as("gr"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1),
          s"shingle kernel/HOF diverged at n=$n")
        assert(r.getSeq[String](2) === r.getSeq[String](3),
          s"slide kernel/HOF diverged at n=$n")
      }
    }
  }
}
