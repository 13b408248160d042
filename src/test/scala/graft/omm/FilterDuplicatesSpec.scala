package graft.omm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The 7 `filterDuplicates` cases of the reference's
  * OmmCancellationHandlerTest.java:15–87, ported against the engine's A1
  * dedup (CancellationPipeline.dedup semantics: CANCELED beats RUNNING,
  * then latest event timestamp).
  */
class FilterDuplicatesSpec extends SparkSpec {
  import spark.implicits._

  private def cancellations(
      rows: Seq[(String, Long, String, Long)]): DataFrame =
    rows.toDF("trip_id", "deviation_case_id", "status", "event_ts_ms")

  private def dedup(df: DataFrame): DataFrame =
    Dedup.priorityDedup(df,
      keys = Seq("trip_id", "deviation_case_id"),
      priority = when(col("status") === "CANCELED", 0).otherwise(1),
      ts = col("event_ts_ms"),
      tieBreak = col("status"))

  // OmmCancellationHandlerTest.java:15–19
  test("empty input stays empty") {
    assert(dedup(cancellations(Seq())).count() === 0)
  }

  // :21–27
  test("single CANCELED survives") {
    val out = dedup(cancellations(Seq(("7001", 1L, "CANCELED", 1000L))))
    assert(out.count() === 1)
    assert(out.select("status").as[String].head() === "CANCELED")
  }

  // :29–35
  test("single RUNNING survives") {
    val out = dedup(cancellations(Seq(("7001", 1L, "RUNNING", 1000L))))
    assert(out.count() === 1)
    assert(out.select("status").as[String].head() === "RUNNING")
  }

  // :37–47
  test("CANCELED + RUNNING on same dvjId: CANCELED wins") {
    val out = dedup(cancellations(Seq(
      ("7001", 1L, "CANCELED", 1000L),
      ("7001", 1L, "RUNNING", 2000L)))) // newer, still loses
    assert(out.count() === 1)
    assert(out.select("status").as[String].head() === "CANCELED")
  }

  // :49–59
  test("two RUNNING on same dvjId: one survives (the latest)") {
    val out = dedup(cancellations(Seq(
      ("7001", 1L, "RUNNING", 1000L),
      ("7001", 1L, "RUNNING", 2000L))))
    assert(out.count() === 1)
    assert(out.select("event_ts_ms").as[Long].head() === 2000L)
  }

  // :61–73
  test("two RUNNING on different dvjIds: both survive") {
    val out = dedup(cancellations(Seq(
      ("7001", 1L, "RUNNING", 1000L),
      ("7002", 1L, "RUNNING", 1000L))))
    assert(out.count() === 2)
    assert(out.filter(col("status") === "CANCELED").count() === 0)
    assert(out.filter(col("status") === "RUNNING").count() === 2)
  }

  // :75–87
  test("CANCELED + RUNNING on different dvjIds: both survive") {
    val out = dedup(cancellations(Seq(
      ("7001", 1L, "CANCELED", 1000L),
      ("7002", 1L, "RUNNING", 1000L))))
    assert(out.count() === 2)
    assert(out.filter(col("status") === "CANCELED").count() === 1)
    assert(out.filter(col("status") === "RUNNING").count() === 1)
  }

  // Handler:177 — grouping is per (dvjId, deviationCaseId): one row per case
  test("same dvjId, different deviationCaseId: one row per case") {
    val out = dedup(cancellations(Seq(
      ("7001", 1L, "CANCELED", 1000L),
      ("7001", 2L, "RUNNING", 2000L))))
    assert(out.count() === 2)
  }
}
