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
}
