package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mixture sampling: budget semantics, determinism, map-side plan. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  // two groups: "big" holds 100 rows x 10 tokens, "small" 5 rows x 10
  private def corpus = spark.range(105).select(
    col("id"),
    when(col("id") < 100, lit("big")).otherwise(lit("small")).as("src"),
    lit(10L).as("w"))

  test("groups under budget keep every row at full rate") {
    val kept = Mix.sampleToBudget(corpus, col("id"), col("src"), col("w"),
      budget = 200L, scale = 10000)
    val small = kept.filter(col("grp") === "small").collect()
    assert(small.length === 5, "small group total 50 <= 200: keep all")
    assert(small.forall(_.getAs[Long]("rate_bp") === 10000L))
  }

  test("oversized groups sample near the budget, never silently explode") {
    val kept = Mix.sampleToBudget(corpus, col("id"), col("src"), col("w"),
      budget = 200L, scale = 10000)
    val bigW = kept.filter(col("grp") === "big")
      .agg(sum("w")).as[Long].collect().head
    // rate = floor(200*10000/1000) = 2000bp → E[kept] = 200, sd ≈ 44
    assert(bigW >= 60 && bigW <= 340, s"kept weight $bigW vs budget 200")
    val rate = kept.filter(col("grp") === "big")
      .select("rate_bp").distinct().as[Long].collect()
    assert(rate.toSeq === Seq(2000L))
  }

  test("deterministic under repartitioning") {
    val a = Mix.sampleToBudget(corpus, col("id"), col("src"), col("w"),
      300L).select("id").as[Long].collect().sorted.toSeq
    val b = Mix.sampleToBudget(corpus.repartition(7), col("id"), col("src"),
      col("w"), 300L).select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("the corpus side joins the rate table by broadcast (map-side keep)") {
    val plan = Mix.sampleToBudget(corpus, col("id"), col("src"), col("w"),
      200L).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate join must broadcast, got:\n$plan")
  }
}
