package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime skew handling: AQE must detect and split a skewed sort-merge
  * join partition (the built-in complement to explicit `Skew` salting —
  * SCALE.md's claim that AQE covers SMJ skew gets a plan-level proof). */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // force SMJ + make the skew thresholds reachable at test scale
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")

      val big = spark.range(200000).select(
        when(col("id") % 10 === 0, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(1000).select(col("id").as("k"), col("id").as("tag"))
      val joined = big.join(dim, "k")
      // execute THIS queryExecution (count() would spawn a separate one
      // whose adaptive replan we couldn't observe here)
      joined.collect()

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
