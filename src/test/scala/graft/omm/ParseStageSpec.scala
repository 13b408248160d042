package graft.omm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.omm.{CancellationPipeline => P, OmmFixtures => F}

/** Parse-stage unit semantics over inline snapshot-shaped rows: status
  * derivation branches (incl. the NULL-status → CANCELED null-guard,
  * OmmCancellationHandler.java:127), case-insensitivity, and reject-reason
  * precedence. */
class ParseStageSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal snapshot-shaped frame; only parse-relevant columns vary. */
  private def snapRows(rows: (String, String, String, String, String, Option[String])*): DataFrame =
    rows.toSeq.zipWithIndex.map { case ((status, dcType, adType, cat, sub, lm), i) =>
      (i.toLong, status, dcType, adType, cat, sub, lm,
        "t", "d", s"${600 + i}", "R1", 1, "20240516", "08:30:00")
    }.toDF("deviation_case_id", "AFFECTED_DEPARTURES_STATUS",
      "DEVIATION_CASES_TYPE", "AFFECTED_DEPARTURES_TYPE", "CATEGORY",
      "SUB_CATEGORY", "lm_s", "TITLE", "DESCRIPTION", "DVJ_ID", "ROUTE_NAME",
      "DIRECTION", "OPERATING_DAY", "START_TIME")
      .withColumn("AFFECTED_DEPARTURES_LAST_MODIFIED", col("lm_s").cast("timestamp"))
      .drop("lm_s")

  private val ok = ("active", "CANCEL_DEPARTURE", "CANCEL_ENTIRE_DEPARTURE",
    "WEATHER", "OTHER", Some("2024-05-15 10:00:00"))

  test("status derivation: deleted→RUNNING (case-insensitive), active/NULL→CANCELED") {
    val out = P.parse(snapRows(
      ok,
      ok.copy(_1 = "deleted"),
      ok.copy(_1 = "DELETED"), // Hand:127 toLowerCase
      ok.copy(_1 = null) // null skips the check → CANCELED
    ), F.zone).select("deviation_case_id", "status")
      .as[(Long, String)].collect().toMap
    assert(out === Map(0L -> "CANCELED", 1L -> "RUNNING",
      2L -> "RUNNING", 3L -> "CANCELED"))
  }

  test("unknown (non-null) AD status drops the row") {
    val out = P.parse(snapRows(ok, ok.copy(_1 = "zombie")), F.zone)
    assert(out.select("deviation_case_id").as[Long].collect().toSeq === Seq(0L))
    val rej = P.rejects(snapRows(ok.copy(_1 = "zombie")), F.zone)
      .select("reject_reason").as[String].head()
    assert(rej === "unknown_ad_status")
  }

  test("reject reason = FIRST failing check in declaration order") {
    // row fails both dc-type and category → dc-type (declared first) wins
    val rej = P.rejects(snapRows(
      ok.copy(_2 = "BAD_TYPE", _4 = "BAD_CATEGORY")), F.zone)
      .select("reject_reason").as[String].head()
    assert(rej === "unknown_deviation_cases_type")
  }

  test("null event timestamp rejects with its own reason") {
    val rej = P.rejects(snapRows(ok.copy(_6 = None)), F.zone)
      .select("reject_reason").as[String].head()
    assert(rej === "null_event_timestamp")
  }

  test("event time converts Helsinki wall-clock to UTC epoch ms") {
    val ms = P.parse(snapRows(ok), F.zone)
      .select("event_ts_ms").as[Long].head()
    assert(ms === 1715756400000L) // 2024-05-15 10:00 +03:00 = 07:00Z
  }
}
