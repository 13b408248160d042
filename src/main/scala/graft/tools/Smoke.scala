package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke harness: drives the library surface on real testdata.
  * Usage: sbt "runMain graft.tools.Smoke [sfDir]"
  * Not part of the driver contract — Verify/Bench are; this is the
  * fast local loop for eyeballing operator output + plans.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    println(s"== q251 coarse-ceiling sweep on $sfDir ==")
    graft.queries.TestdataQueries.q251CeilingTable(spark, sfDir)
      .orderBy("n_lists").show(20, false)
    println(s"== served hits: q248 (8,4) vs q252 (32,16) on $sfDir ==")
    graft.queries.TestdataQueries.q248HitsTable(spark, sfDir)
      .agg(sum(col("hits")).as("q248_hits_sum")).show()
    graft.queries.TestdataQueries.q248HitsTable(spark, sfDir,
        nLists = 32, nProbe = 16)
      .agg(sum(col("hits")).as("q252_hits_sum")).show()
    spark.stop()
  }
}
