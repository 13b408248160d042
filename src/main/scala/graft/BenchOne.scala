package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // diagnosis hook: SPARK_GRAFT_CONF="k=v;k=v" overlays extra session
    // confs (e.g. spark.sql.codegen.wholeStage=false to attribute codegen
    // compile cost) without touching the Bench contract
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.omm.OmmFixtures.ensure(spark)
    try Seq("lineitem", "orders", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()) catch { case _: Throwable => () }
    // job counter: scheduling latency of many small jobs is what a
    // contended box amplifies (round-6 q44 forensics), so the job count
    // per query is a first-class figure next to the wall time
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    // same contention witnesses as Bench: loadavg sees our own runqueue,
    // /proc/stat steal (field 8) sees the hypervisor running a co-tenant
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(' ')(0).toDouble
      catch { case _: Throwable => -1.0 }
    def stealJiffies(): Long =
      try scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
      catch { case _: Throwable => -1L }
    for (n <- names; rep <- 1 to 3) {
      // mirror Bench's per-rep reset exactly so standalone numbers are
      // comparable with in-bench medians
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val j0 = jobs.get()
      val s0 = stealJiffies()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener delivery is async: give the bus a moment to drain so
      // this rep's onJobStart events don't land in the next rep's window
      Thread.sleep(500)
      println(f"TIMING $n rep$rep $wall%.2f s jobs=${jobs.get()-j0} load=${loadavg()}%.2f steal_d=${stealJiffies()-s0}")
    }
    spark.stop()
  }
}
