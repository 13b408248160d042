package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Seq(sfDir, outDir, rest @ _*) = args.toSeq
    // optional: --only q1,q2 restricts the dump for local iteration; the
    // driver's 2-arg invocation always dumps everything
    val only: Option[Set[String]] = rest match {
      case Seq("--only", names) => Some(names.split(",").toSet)
      case _ => None
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // per-query cache-hygiene check: a query that leaves NEW persistent
      // RDDs behind is named HERE, at the offender — not two suites later
      // by an unrelated global assertion (the round-8 DupClusters leak was
      // found that way). PlanShapeSpec asserts the same invariant; this
      // report is the driver-visible evidence.
      val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(rddsBefore)
      if (leaked.nonEmpty)
        System.err.println(s"[verify][hygiene] $name left ${leaked.size} " +
          s"persistent RDDs behind: ids=${leaked.toSeq.sorted.mkString(",")}")
      // release anything a query persisted/localCheckpointed: 101 queries
      // in one JVM otherwise accumulate cached relations (same residue
      // that distorted the round-5 bench tail)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
