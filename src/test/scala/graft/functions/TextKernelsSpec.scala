package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Banded-Levenshtein kernel: equivalence with the textbook full DP on
  * random inputs (the reference implementation here is independent of the
  * kernel — full matrix, no band). */
class TextKernelsSpec extends AnyFunSuite {

  private def naive(a: String, b: String): Int = {
    val s = a.codePoints.toArray
    val t = b.codePoints.toArray
    val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to s.length; j <- 1 to t.length) {
      val cost = if (s(i - 1) == t(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
    }
    d(s.length)(t.length)
  }

  private def bounded(a: String, b: String, k: Int): Int =
    TextKernels.boundedLevenshtein(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("equals the full DP when distance <= k, -1 otherwise (randomized)") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcde 日本語"
    for (_ <- 1 to 2000) {
      val a = Seq.fill(rng.nextInt(30))(alphabet(rng.nextInt(alphabet.length))).mkString
      val b = Seq.fill(rng.nextInt(30))(alphabet(rng.nextInt(alphabet.length))).mkString
      val k = rng.nextInt(15)
      val expected = naive(a, b)
      val got = bounded(a, b, k)
      if (expected <= k) assert(got === expected, s"a='$a' b='$b' k=$k")
      else assert(got === -1, s"a='$a' b='$b' k=$k expected $expected > k")
    }
  }

  test("edge cases: empty strings, identical, length gap beyond k") {
    assert(bounded("", "", 0) === 0)
    assert(bounded("", "abc", 3) === 3)
    assert(bounded("", "abc", 2) === -1)
    assert(bounded("same", "same", 0) === 0)
    assert(bounded("abcdefghij", "a", 5) === -1) // length gap 9 > 5
  }
}

/** The Catalyst expression stays inside whole-stage codegen and agrees
  * with the built-in `levenshtein` on a real corpus slice. */
class BoundedLevenshteinExprSpec extends SparkSpec {
  import spark.implicits._

  test("expression agrees with built-in levenshtein in the <= k regime") {
    val pairs = Seq(("kitten", "sitting"), ("flaw", "lawn"), ("", "ab"),
      ("abcdef", "abcdef"), ("日本語テスト", "日本語のテスト"))
      .toDF("a", "b")
    val out = pairs.select(
      levenshtein($"a", $"b").as("full"),
      TextKernels.boundedLevenshtein($"a", $"b", 3).as("bounded"))
      .as[(Int, Int)].collect()
    out.foreach { case (full, bnd) =>
      if (full <= 3) assert(bnd === full) else assert(bnd === -1)
    }
  }

  test("participates in whole-stage codegen (no fallback)") {
    // base on range (codegen-able source): a literal local relation would
    // be folded at optimization time and leave no codegen stage to inspect
    val df = spark.range(10)
      .selectExpr("cast(id as string) as a", "cast(id + 1 as string) as b")
      .filter(TextKernels.boundedLevenshtein($"a", $"b", 2) >= 0)
    val codegen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(codegen.contains("boundedLevenshtein"),
      "kernel call missing from generated code")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), "filter stage lost whole-stage codegen")
  }

  test("nfcNormalize composes decomposed sequences, zero-copies NFC text") {
    // "e" + COMBINING ACUTE (U+0301) composes to precomposed U+00E9
    val decomposed = "caf" + "e\u0301"
    val composed = "caf\u00e9"
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "t")
    val out = df.select(col("id"),
        TextKernels.nfcNormalize(col("t")).as("n"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out(0)._2 === composed, "decomposed input must compose")
    assert(out(1)._2 === composed)
    assert(out(2)._2 === "plain ascii")
  }

  test("normalizeText: NFC + lower + control strip + whitespace collapse") {
    // "Cafe" + combining acute composes to precomposed E9 then lowercases;
    // tab/newline are control chars -> spaces -> collapsed; ends trimmed
    val df = Seq((1L, "  CAFE\u0301\tNoir\n  x ")).toDF("id", "t")
    val out = df.select(graft.functions.TextExprs.normalizeText(col("t")))
      .as[String].collect().head
    assert(out === "caf\u00e9 noir x")
  }

  test("nfcNormalize participates in whole-stage codegen") {
    val df = spark.range(5).select(concat(lit("v"), col("id")).as("t"))
    val plan = df.select(TextKernels.nfcNormalize(col("t")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("nfc_normalize")), s"plan:\n$plan")
  }

  test("letterUnits == length(regexp_replace(text, '[^\\p{L}]', '')) — " +
      "ascii, accents, CJK, astral letters, lone surrogate, empty") {
    val cases = Seq(
      "plain ascii words", "MiXeD 123 case!", "", "   ", "1234 5678",
      "café résumé",       // precomposed accents (Ll)
      "café",                        // combining mark is NOT a letter
      "你好 world",               // CJK (Lo)
      "𝒜 math",                // U+1D49C script capital A: astral letter = 1 code point
      "\ud800 lone surrogate",            // unpaired surrogate: not a letter
      "ʰmodifier",                    // U+02B0 (Lm) counts as letter
      "tab\tand\nnewline")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val out = df.select(col("id"),
        TextKernels.letterUnits(col("t")).as("kernel"),
        length(regexp_replace(col("t"), "[^\\p{L}]", "")).as("regex"))
      .collect()
    out.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"mismatch on case ${r.getLong(0)}: '${cases(r.getLong(0).toInt)}'")
    }
  }

  test("letterUnits participates in whole-stage codegen") {
    val df = spark.range(5).select(concat(lit("v"), col("id")).as("t"))
    val plan = df.select(TextKernels.letterUnits(col("t")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("letter_units")), s"plan:\n$plan")
  }
}
