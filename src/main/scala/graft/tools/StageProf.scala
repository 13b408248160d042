package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off stage-level wall attribution for the heavy ANN sweep queries:
  * replays q253's pipeline stage by stage with timers so the driver gap
  * JobProf exposes (wall − jobSum) can be pinned to a stage. Diagnostic
  * only — not part of the bench contract. */
object StageProf {
  private var t0 = System.nanoTime()
  private val jobMs = new java.util.concurrent.atomic.AtomicLong
  private val jobN = new java.util.concurrent.atomic.AtomicInteger
  private def mark(label: String): Unit = {
    Thread.sleep(300) // drain listener bus so job time lands in its stage
    val t1 = System.nanoTime()
    val wall = (t1 - t0) / 1e9
    val js = jobMs.getAndSet(0L) / 1000.0
    println(f"STAGE $label $wall%7.2f s  jobs=${jobN.getAndSet(0)}%3d jobSum=$js%6.2f s gap=${wall - js}%6.2f s")
    t0 = System.nanoTime()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(j.jobId, j.time); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(e.jobId)).foreach { t =>
            jobMs.addAndGet(e.time - t); jobN.incrementAndGet()
          }
          ()
        }
      })
    // warm rep of the real query so codegen/JIT steady state matches
    // BenchOne's rep2+
    graft.SparkEntry.queries("q253_shortlist_sweep")(spark, sfDir).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    t0 = System.nanoTime()
    run(spark, sfDir)
    spark.stop()
  }

  private def run(s: SparkSession, d: String): Unit = {
    val nLists = 32
    val nProbe = 16
    val ms = Seq(8, 16)
    val rs = Seq(100, 200, 400)
    val pqDim = 64
    val k = 16
    val embs = graft.sources.Tables.embeddings(s, d)
    val origQ = embs.filter(col("vec_id") < 10)
    val exact = graft.operators.CacheHygiene.spillToTempParquet(
      Similarity.bruteForceTopKL2(embs, origQ, "vec_id", "embedding",
        k = 5).select(col("query_id"), col("neighbor_id")),
      "q253_exact")
    mark("exact_bruteforce_spill")
    val coarse = graft.operators.Quantize.learnedCoarse(embs,
      col("embedding"), nLists = nLists, seed = 42L)
    mark("learnedCoarse")
    val listC = graft.operators.Quantize.ivfListCol(col("embedding"),
      coarse)
    val resC = graft.operators.Quantize.ivfResidualCol(col("embedding"),
      coarse, listC)
    val armTables = ms.map { m =>
      val (rotM, rcb) = graft.operators.Quantize.learnedOpq(embs, resC,
        m, pqDim, k = k, seed = 11L)
      mark(s"learnedOpq m=$m")
      val rotCoarse = coarse.map { case (l, c) =>
        l -> rotM.map(row => row.zip(c).map { case (a, b) => a * b }.sum)
      }
      val rot = embs.select(col("vec_id"),
        Similarity.rpProject(col("embedding").cast("array<double>"), rotM)
          .as("rvec"))
      val rListC = graft.operators.Quantize.ivfListCol(col("rvec"),
        rotCoarse)
      val rResC = graft.operators.Quantize.ivfResidualCol(col("rvec"),
        rotCoarse, rListC)
      val codes = graft.operators.Quantize.pqEncode(rot, col("vec_id"),
          rResC, rcb, m, pqDim, keep = Seq(rListC.as("list_id")))
        .drop("distortion")
      val dirFile = java.nio.file.Files.createTempDirectory("q253_ivf").toFile
      graft.operators.CacheHygiene.registerForCleanup(dirFile)
      val dir = dirFile.getAbsolutePath + "/codes"
      codes.repartition(col("list_id")).write.mode("overwrite")
        .partitionBy("list_id").parquet(dir)
      mark(s"pqEncode+write m=$m")
      val qset = rot.filter(col("vec_id") < 10)
      val shortMax = graft.operators.CacheHygiene.spillToTempParquet(
        graft.operators.Quantize.ivfPqResidualTopK(
          s.read.parquet(dir), qset, "vec_id", "rvec", rotCoarse, rcb, m,
          pqDim, nProbe, k = rs.max),
        "q253_short")
      mark(s"adcScan+spill m=$m")
      val t = rs.map { r =>
        val shortlist = shortMax.filter(col("rank") <= r)
        val ann = graft.operators.Quantize.rerankL2(shortlist, embs,
          origQ, "vec_id", "embedding", k = 5)
        exact
          .join(ann.select(col("query_id"), col("neighbor_id"))
              .withColumn("__hit", lit(true)),
            Seq("query_id", "neighbor_id"), "left")
          .select(lit(m).as("pq_m"), lit(r).as("shortlist_r"),
            coalesce(col("__hit"), lit(false)).as("hit"))
      }.reduce(_ unionByName _)
      mark(s"rerank arms built (lazy) m=$m")
      t
    }
    val out = armTables.reduce(_ unionByName _)
      .groupBy(col("pq_m"), col("shortlist_r"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"))
    out.count()
    mark("final union+rerank+agg count")
  }
}
