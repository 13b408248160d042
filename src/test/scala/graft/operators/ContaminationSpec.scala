package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The bloom-gated decontamination variant must be output-identical to
  * the exact broadcast operator: the filter has no false negatives and
  * every positive is confirmed against the real relation, so it can
  * only change COST, never results. */
class ContaminationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)

  private def split = (
    docs.filter(col("doc_id") % 50 =!= 0),
    docs.filter(col("doc_id") % 50 === 0))

  test("bloom-gated overlap is row-identical to the exact broadcast form") {
    val (corpus, bench) = split
    val exact = Contamination.overlapVsBenchmark(corpus, bench,
        col("doc_id"), col("text"), n = 3)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val bloomed = Contamination.overlapVsBenchmarkBloom(corpus, bench,
        col("doc_id"), col("text"), n = 3, fpp = 0.01)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(bloomed.nonEmpty && bloomed === exact)
    // and again at a deliberately terrible fpp — correctness must not
    // depend on the filter being selective, only the join volume does
    val sloppy = Contamination.overlapVsBenchmarkBloom(corpus, bench,
        col("doc_id"), col("text"), n = 3, fpp = 0.5)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(sloppy === exact)
  }

  test("the exact join is gated by the bloom probe in the plan") {
    val (corpus, bench) = split
    val plan = Contamination.overlapVsBenchmarkBloom(corpus, bench,
        col("doc_id"), col("text"), n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom gate missing from plan:\n$plan")
  }

  // --------------------------------------- fuzzy (near-dup) decontamination

  import spark.implicits._

  test("fuzzyVsBenchmark flags near- and exact copies, spares low overlap") {
    val corpus = Seq(
      // exact copy of bench doc 70 → jaccard 1.0
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      // last token differs: 10 tokens → 8 shingles each, 1 window (start
      // 7) touches zz → 7 shared / 9 union = 0.778 < τ → spared
      (2L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 zz"),
      // shares only a 3-token prefix → far below 0.8
      (3L, "t0 t1 t2 u3 u4 u5 u6 u7 u8 u9"),
      (4L, "completely different words here entirely")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (70L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (71L, "other benchmark material again")).toDF("doc_id", "text")
    val out = Contamination.fuzzyVsBenchmark(corpus, bench,
        col("doc_id"), col("text"), n = 3, bands = 16, rowsPerBand = 2,
        threshold = 0.8)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(1L) === ((1L, 1.0)))
    assert(!out.contains(2L) && !out.contains(3L) && !out.contains(4L))
  }

  test("fuzzy jaccard equals the exact shingle-set computation") {
    // 20 tokens → 18 distinct 3-shingles; the copy changes the last
    // token, touching only window 17 → 17 shared / 19 union ≈ 0.8947
    val t = (0 until 20).map(i => s"w$i").mkString(" ")
    val t2 = (0 until 19).map(i => s"w$i").mkString(" ") + " zz"
    val corpus = Seq((1L, t2)).toDF("doc_id", "text")
    val bench = Seq((7L, t)).toDF("doc_id", "text")
    val out = Contamination.fuzzyVsBenchmark(corpus, bench,
        col("doc_id"), col("text"), n = 3, bands = 16, rowsPerBand = 2,
        threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 1L,
      BigDecimal(17.0 / 19.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("fuzzyVsBenchmark plan: benchmark bands and candidates broadcast, " +
    "corpus never cartesian-joined") {
    val corpus = Seq((1L, "a b c d e f"), (2L, "g h i j k l"))
      .toDF("doc_id", "text")
    val bench = Seq((7L, "a b c d e f")).toDF("doc_id", "text")
    val plan = Contamination.fuzzyVsBenchmark(corpus, bench,
        col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("sourceOverlapMatrix: containment-style coefficient per source pair") {
    // srcA: two docs; srcB repeats one of A's docs verbatim (full overlap
    // of B's grams); srcC disjoint
    val docs = Seq(
      ("A", "a b c d e"), ("A", "p q r s t"),
      ("B", "a b c d e"),
      ("C", "x y z w v")
    ).toDF("src", "text")
    val got = Contamination.sourceOverlapMatrix(docs, col("src"),
        col("text"), n = 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // A has 6 distinct 3-grams (3 per doc), B has 3, all shared -> 1.0
    assert(got === Map(("A", "B") -> ((3L, 6L, 3L, 1.0))))
  }

  test("sourceOverlapMatrix: short docs fall back to the whole-doc shingle") {
    val docs = Seq(("A", "a b"), ("B", "a b"), ("C", "a")).toDF("src", "text")
    val got = Contamination.sourceOverlapMatrix(docs, col("src"),
        col("text"), n = 3)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("A", "B", 1L, 1L, 1L, 1.0)))
  }

  test("sourceOverlapMatrixSketch: exact when the pair universe fits in k") {
    val docs = Seq(
      ("A", "a b c d e"), ("A", "p q r s t"),
      ("B", "a b c d e"),
      ("C", "x y z w v")
    ).toDF("src", "text")
    // k=64 >> any source's distinct 3-gram count: the sketches ARE the
    // hash sets, so j_est and overlap_est are exact
    val got = Contamination.sourceOverlapMatrixSketch(docs, col("src"),
        col("text"), n = 3, k = 64)
      .as[(String, String, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // A: 6 distinct grams, B: 3 (all shared), C: 3 (disjoint)
    val ab = got(("A", "B"))
    assert(ab._3 === 3L && ab._4 === 6L)          // common=3, union=6
    assert(ab._5 === 0.5 && ab._8 === 1.0)        // J=3/6, overlap=3/min(6,3)
    assert(ab._6 === 6.0 && ab._7 === 3.0)        // exact cardinalities
    val ac = got(("A", "C"))
    assert(ac._3 === 0L && ac._5 === 0.0 && ac._8 === 0.0)
  }

  test("sourceOverlapMatrixSketch estimates track the exact matrix at small k") {
    // two sources with heavy but partial overlap, enough grams to engage
    // the estimator (universe >> k)
    val mk = (tag: String, off: Int) => (0 until 40).map { i =>
      (tag, (0 until 12).map(j => s"w${(i * 7 + j + off) % 150}").mkString(" "))
    }
    val docs = (mk("A", 0) ++ mk("B", 0) ++ mk("B", 97)).toDF("src", "text")
    val exact = Contamination.sourceOverlapMatrix(docs, col("src"),
        col("text"), n = 3)
      .select("src_a", "src_b", "overlap").as[(String, String, Double)]
      .collect().head._3
    val est = Contamination.sourceOverlapMatrixSketch(docs, col("src"),
        col("text"), n = 3, k = 128)
      .select("overlap_est").as[Double].collect().head
    assert(math.abs(est - exact) < 0.25,
      s"sketch overlap $est vs exact $exact")
  }

  test("rateBySource: exact rollup arithmetic on a hand-built table") {
    val contam = Seq(
      (1L, 10L, 8L, true), (2L, 10L, 2L, false), // src A: 1/2 docs, 10/20
      (3L, 5L, 0L, false)) // src B: 0/1 docs, 0/5 grams
      .toDF("id", "n_shingles", "n_overlap", "contaminated")
    val sources = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("id", "source")
    val got = Contamination.rateBySource(contam, sources)
      .as[(String, Long, Long, Double, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("A") === ("A", 2L, 1L, 0.5, 20L, 10L, 0.5))
    assert(got("B") === ("B", 1L, 0L, 0.0, 5L, 0L, 0.0))
  }
}
