package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job wall-time attribution for ONE registered query: runs the query
  * once (after the standard warmup) and prints every Spark job's duration
  * and call site, so a multi-job harness query (the streaming sims, the
  * ANN sweeps) can be broken down without the UI. Usage:
  * `sbt "runMain graft.tools.JobProf <query> [sfDir]"` */
object JobProf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q92_streaming_semdedup")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.omm.OmmFixtures.ensure(spark)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .map(_.getProperty("callSite.short", "?")).getOrElse("?")
        starts.put(j.jobId, (j.time, site)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, site) =>
          lines.add(f"JOB ${e.jobId}%4d ${(e.time - t0) / 1000.0}%7.2f s  $site")
        }
        ()
      }
    })
    // one untimed warm rep, then the profiled rep (mirrors BenchOne's
    // median-of-3 steady state)
    try { graft.SparkEntry.queries(name)(spark, sfDir).count() }
    catch { case e: Throwable => println(s"warm rep failed: $e") }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    lines.clear()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800) // drain the listener bus
    import scala.jdk.CollectionConverters._
    val ls = lines.asScala.toVector
    ls.foreach(println)
    val jobSum = ls.map(_.split("\\s+")(2).toDouble).sum
    println(f"TOTAL $name wall=$wall%.2f s jobs=${ls.size} jobSum=$jobSum%.2f s gap=${wall - jobSum}%.2f s")
    spark.stop()
  }
}
