package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime bloom-filter join pruning (`InjectRuntimeFilter`): on a join
  * whose build side is selectively filtered, Spark can bloom-filter the
  * probe side's scan BEFORE the shuffle — at 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * ~matching sliver. The defaults only engage past size thresholds
  * (creation side ≤ 10 MB AND application-side scan ≥ 10 GB) that local
  * fixtures never reach, so this spec drops the thresholds to prove the
  * engine path is live and that our join shapes are eligible — i.e. a
  * cluster run at real scale gets the filter for free, no code change.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withRuntimeFilter[A](f: => A): A = {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // fixtures are broadcast-sized, which makes InjectRuntimeFilter
      // classify every join as non-shuffle and skip; at real scale the
      // fact side is never broadcast-able, so emulate that here
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter into the fact scan") {
    withRuntimeFilter {
      // force a shuffle join: runtime filters only pay (and only inject)
      // when the probe side would otherwise shuffle in full
      val plan = Tables.lineitem(spark, sf)
        .hint("merge")
        .join(Tables.part(spark, sf).filter(col("p_size") > 40),
          col("l_partkey") === col("p_partkey"))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom filter (might_contain) in:\n$plan")
      assert(plan.contains("bloom_filter_agg"),
        "expected the build-side bloom_filter_agg subquery")
    }
  }

  test("unfiltered build side injects nothing (no wasted bloom)") {
    withRuntimeFilter {
      val plan = Tables.lineitem(spark, sf)
        .hint("merge")
        .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("might_contain"),
        "bloom filter must not inject without a selective build-side filter")
    }
  }
}
