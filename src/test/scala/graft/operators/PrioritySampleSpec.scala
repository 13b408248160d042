package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A-ES weighted sampling: inclusion tracks weight, exact-k, hygiene. */
class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  test("inclusion probability tracks weight: dominant rows win their group") {
    // 200 groups, each one row of weight 1e6 (ids g*1000) + 50 of weight 1
    val rows = spark.range(200).select(col("id").as("g"))
      .select(col("g"), explode(sequence(lit(0), lit(50))).as("j"))
      .select((col("g") * 1000 + col("j")).as("id"),
        col("g").cast("string").as("src"),
        when(col("j") === 0, 1000000L).otherwise(1L).as("w"))
    val picked = Mix.prioritySampleByGroup(rows, col("id"), col("src"),
      col("w"), k = 1)
    val dominant = picked.filter(col("id") % 1000 === 0).count()
    assert(dominant >= 195, s"dominant picked in only $dominant/200 groups")
  }

  test("exactly k per group with ranks 1..k") {
    val rows = spark.range(300).select(col("id"),
      (col("id") % 3).cast("string").as("src"), lit(10L).as("w"))
    val out = Mix.prioritySampleByGroup(rows, col("id"), col("src"),
      col("w"), k = 7)
    assert(out.count() === 21)
    assert(out.groupBy("grp").agg(max("rank")).collect()
      .forall(_.getInt(1) === 7))
  }

  test("deterministic under repartitioning; non-positive weights excluded") {
    val rows = spark.range(100).select(col("id"),
      lit("g").as("src"),
      when(col("id") % 10 === 0, 0L).otherwise(col("id") % 7 + 1).as("w"))
    val a = Mix.prioritySampleByGroup(rows, col("id"), col("src"),
      col("w"), 5).collect().map(_.toSeq).toSeq
    val b = Mix.prioritySampleByGroup(rows.repartition(9), col("id"),
      col("src"), col("w"), 5).collect().map(_.toSeq).toSeq
    assert(a === b)
    val zeros = Mix.prioritySampleByGroup(rows.filter(col("w") === 0),
      col("id"), col("src"), col("w"), 5)
    assert(zeros.count() === 0)
  }
}
