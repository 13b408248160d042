package graft

import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.jdk.CollectionConverters._

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FormattedMode, SparkPlan}

import graft.omm.OmmFixtures

/** ONE registry-wide instantiation + execution pass, shared by every
  * registry-sweep assertion (PlanShapeSpec's structural and cache-hygiene
  * sweeps, GraftGuardsSpec's guard sweep, and PlanShapeSpec's per-query
  * plan-shape tests).
  *
  * Why it exists (r19, test-budget fix): the r18 suites each
  * re-instantiated — and, for the imperative streaming sims, re-RAN —
  * all 264 registered queries, three times over (PlanShapeSpec's two
  * sweeps + GraftGuardsSpec's). That triple pass was the bulk of the
  * 37-minute `sbt test` wall that blew the r18 driver budget
  * (PlanShapeSpec 816 s + GraftGuardsSpec 273 s of a 2 230 s suite).
  * Every datum those tests assert on is captured here in a single lazy
  * pass; the assertions themselves are unchanged.
  *
  * The pass runs queries on a bounded thread pool (guide §2.6 —
  * independent jobs overlap: most of a fixture-scale query's wall is
  * driver-side planning/codegen and sim state commits, which parallelize
  * across queries). Value-safety under concurrency:
  *  - every registered query is deterministic (oracle hash-matched), so a
  *    cache dropped by a concurrent scope can only force an identical
  *    recompute;
  *  - lineage-TRUNCATED caches (`localCheckpoint`) exist only inside
  *    [[graft.operators.CacheHygiene.withRddCleanup]] scopes, which are
  *    JVM-mutex'd (see there), so no scope's diff-cleanup can drop
  *    another scope's pinned RDDs;
  *  - per-query state/sink dirs are `createTempDirectory`-unique;
  *  - [[OmmFixtures.ensure]] is synchronized and marker-idempotent.
  *
  * The serial hygiene sweep's per-query leak ATTRIBUTION is preserved
  * two-phase: the parallel pass snapshots the persistent-RDD set around
  * the whole run (exact, because the property under test is precisely
  * that every query releases its caches before returning); only if that
  * global diff is non-empty does a serial re-run attribute the leak to
  * the offending query — the slow path runs only when the suite is
  * already red. */
object RegistrySweep {

  val sf = "/root/testdata/sf0.001"

  final case class Audit(
      name: String,
      formatted: String,    // explainString(FormattedMode)
      optimizedStr: String, // optimizedPlan.toString
      executedStr: String,  // executedPlan.toString
      guardError: Option[String], // ScaleGuard failure on the optimized plan
      structuralOffenders: Seq[String], // cartesian / unpartitioned window
      error: Option[String]) // instantiation or execution failure

  final case class Result(audits: Map[String, Audit],
                          leakOffenders: Seq[String])

  lazy val result: Result = run()

  def audit(name: String): Audit = {
    val a = result.audits(name)
    assert(a.error.isEmpty, s"$name failed in the registry sweep: ${a.error}")
    a
  }

  /** The executed-plan walk the structural sweep uses: descends into AQE
    * wrappers, cached-relation build plans and subqueries (same traversal
    * PlanShapeSpec asserted with pre-r19). */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.inputPlan)
      case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        allNodes(im.relation.cachedPlan)
      case _ => Seq.empty
    }
    (p +: here) ++ p.children.flatMap(allNodes) ++
      p.subqueries.flatMap(allNodes)
  }

  private def structural(p: SparkPlan): Seq[String] =
    allNodes(p).flatMap {
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        Some("CartesianProduct")
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty =>
        Some("unpartitioned WindowExec (AllTuples — one task ranks every " +
          "row; partition it or prove the input k-bounded and whitelist " +
          "with the proof)")
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
          if w.partitionSpec.isEmpty =>
        Some("unpartitioned WindowGroupLimit")
      case _ => None
    }.distinct

  private def auditOne(spark: SparkSession, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      scratch: java.io.File): Audit =
    try {
      spark.sparkContext.setJobDescription(s"registry sweep: $name")
      val df = fn(spark, sf)
      val qe = df.queryExecution
      val guardErr =
        try { graft.plans.ScaleGuard(qe.optimizedPlan); None }
        catch { case e: SparkException => Some(e.getMessage) }
      val offenders = structural(qe.executedPlan)
      val formatted = qe.explainString(FormattedMode)
      // the hygiene-sweep consumption: execute every column of every row
      // to scratch parquet (what Verify does), so scoped caches that only
      // leak under full execution are exercised
      df.write.mode("overwrite")
        .parquet(new java.io.File(scratch, name).getAbsolutePath)
      Audit(name, formatted, qe.optimizedPlan.toString,
        qe.executedPlan.toString, guardErr, offenders, None)
    } catch {
      case e: Throwable =>
        Audit(name, "", "", "", None, Nil, Some(e.toString))
    }

  private def rm(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
  }

  private def run(): Result = {
    val spark = SparkSpec.spark
    OmmFixtures.ensure(spark)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-registry-sweep-").toFile
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val audits = new ConcurrentHashMap[String, Audit]()
    val pool = Executors.newFixedThreadPool(6)
    try {
      val tasks = SparkEntry.queries.toSeq.sortBy(_._1).map {
        case (name, fn) =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              audits.put(name, auditOne(spark, name, fn, scratch)); ()
            }
          })
      }
      tasks.foreach(_.get())
    } finally { pool.shutdown(); rm(scratch) }
    val leakedGlobal =
      spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    val leakOffenders =
      if (leakedGlobal.isEmpty) Nil else attributeLeaksSerially(spark)
    Result(audits.asScala.toMap, leakOffenders)
  }

  /** Slow path, runs only when the parallel pass detected a leak: the
    * pre-r19 serial hygiene sweep, naming the offender at the offending
    * query and releasing its leak so one offender can't cascade. */
  private def attributeLeaksSerially(spark: SparkSession): Seq[String] = {
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-hygiene-serial-").toFile
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val b = spark.sparkContext.getPersistentRDDs.keySet
        try fn(spark, sf).write.mode("overwrite")
          .parquet(new java.io.File(scratch, name).getAbsolutePath)
        catch { case _: Throwable => () } // errors reported via audits
        val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(b)
        if (leaked.nonEmpty) {
          offenders += s"$name (${leaked.size} RDDs)"
          spark.sparkContext.getPersistentRDDs
            .filter { case (id, _) => leaked.contains(id) }
            .values.foreach(_.unpersist(blocking = false))
        }
      }
    } finally rm(scratch)
    offenders.toSeq
  }
}
