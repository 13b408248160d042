package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: re-measure the q145/q148/q243 learned-coarse recall
  * tables whose FLOORS are asserted by the registered queries (MLlib
  * k-means centroids are not SQL-replayable, so the oracle is a floor,
  * not a pin — this prints the actual per-query hits that SCALE.md
  * documents; q148 vs q243 is the seed-residual vs learned-subspace
  * codebook comparison). Usage:
  * sbt "runMain graft.tools.RecallMeasure [sfDir ...]" */
object RecallMeasure {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { d =>
      Seq(
        "q145 ivfpq learned" ->
          graft.queries.TestdataQueries.q145HitsTable(spark, d),
        "q148 ivfadc learned" ->
          graft.queries.TestdataQueries.q148HitsTable(spark, d),
        "q243 learned-pq     " ->
          graft.queries.TestdataQueries.q243HitsTable(spark, d)
      ).foreach { case (name, hits) =>
        val rows = hits.orderBy("query_id").collect()
          .map(r => s"${r.getLong(0)}->${r.getLong(1)}")
        val total = hits.agg(
          org.apache.spark.sql.functions.sum("hits")).head().getLong(0)
        println(s"[recall] $name $d: ${rows.mkString(" ")}  total=$total/50")
      }
    }
    spark.stop()
  }
}
