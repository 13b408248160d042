package graft.omm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.omm.{CancellationPipeline => P, OmmFixtures => F}

/** F2/F2b truth table (cancellations_current_future.sql:33–35 /
  * cancellations_past_current_future.sql:34–37): every branch of the
  * temporal-validity predicate, NOW vs PAST mode, driven through the real
  * snapshot operator with minimal single-case inputs.
  *
  * Fixed evaluation point: now = 2024-05-15 12:00:00, today = 2024-05-15,
  * lookback 1800 s (→ 11:30:00).
  */
class ValidityPredicateSpec extends SparkSpec {
  import spark.implicits._

  /** One deviation case + one AD row with the given temporal shape; all
    * other joins/filters satisfied. Returns (kept in NOW, kept in PAST). */
  private def evalCase(validTo: Option[String], adStatus: String,
                       opDay: String, dcLastModified: String): (Boolean, Boolean) = {
    val dc = Seq((1L, 21L, "2024-05-01 00:00:00", validTo, "CANCEL_DEPARTURE",
      dcLastModified))
      .toDF("deviation_case_id", "bulletin_id", "valid_from", "valid_to",
        "type", "last_modified")
      .select(col("deviation_case_id"), col("bulletin_id"),
        col("valid_from").cast("timestamp"), col("valid_to").cast("timestamp"),
        col("type"), col("last_modified").cast("timestamp"))
    val ad = Seq((1L, 601L, adStatus, "CANCEL_ENTIRE_DEPARTURE",
      "2024-05-15 10:00:00"))
      .toDF("deviation_case_id", "departure_id", "status", "type", "last_modified")
      .select(col("deviation_case_id"), col("departure_id"), col("status"),
        col("type"), col("last_modified").cast("timestamp"))
    val blm = Seq((21L, "fi", "t", "d"))
      .toDF("bulletins_id", "language_code", "title", "description")
    val b = Seq((21L, "WEATHER", "OTHER")).toDF("bulletins_id", "category", "sub_category")
    val dvj = Seq((601L, opDay, 501L, 701L, Option.empty[Long], "1900-01-01 08:00:00"))
      .toDF("Id", "OperatingDayDate", "IsBasedOnVehicleJourneyId",
        "IsBasedOnVehicleJourneyTemplateId", "IsReplacedById",
        "PlannedStartOffsetDateTime")
      .select(col("Id"), col("OperatingDayDate").cast("date"),
        col("IsBasedOnVehicleJourneyId"), col("IsBasedOnVehicleJourneyTemplateId"),
        col("IsReplacedById"), col("PlannedStartOffsetDateTime").cast("timestamp"))
    val t = P.OmmTables(dc, ad, blm, b, dvj,
      vj = Seq(501L).toDF("Id"),
      vjt = Seq((701L, "1234567890112345")).toDF("Id", "IsWorkedOnDirectionOfLineGid"),
      kvv = Seq((501L, 13L, "R1")).toDF("IsForObjectId", "IsOfKeyVariantTypeId", "StringValue"),
      kvt = Seq((13L, 3L)).toDF("Id", "IsForKeyTypeId"),
      kt = Seq((3L, 100, "RouteName")).toDF("Id", "ExtendsObjectTypeNumber", "Name"),
      ot = Seq((100, "VehicleJourney")).toDF("Number", "Name"))
    (P.snapshot(t, P.FromNow, F.now, F.today, F.lookback).count() == 1,
      P.snapshot(t, P.FromPast, F.now, F.today, F.lookback).count() == 1)
  }

  test("valid_to in the future → kept in both modes") {
    assert(evalCase(Some("2024-06-01 00:00:00"), "active", "2024-05-16",
      "2024-05-01 00:00:00") === ((true, true)))
  }

  test("valid_to past, stale lm → dropped in both") {
    assert(evalCase(Some("2024-05-01 00:00:00"), "active", "2024-05-16",
      "2024-05-10 00:00:00") === ((false, false)))
  }

  test("valid_to past but lm within lookback → PAST only (F2c)") {
    assert(evalCase(Some("2024-05-01 00:00:00"), "active", "2024-05-16",
      "2024-05-15 11:45:00") === ((false, true)))
  }

  test("valid_to exactly now → dropped NOW (strict >), kept PAST when fresh") {
    assert(evalCase(Some(F.now), "active", "2024-05-16",
      "2024-05-15 11:45:00") === ((false, true)))
  }

  test("cancellation-of-cancellation: null valid_to + deleted + opday ≥ today → both") {
    assert(evalCase(None, "deleted", "2024-05-16",
      "2024-05-01 00:00:00") === ((true, true)))
  }

  test("null valid_to + deleted + opday today (boundary ≥) → both") {
    assert(evalCase(None, "deleted", "2024-05-15",
      "2024-05-01 00:00:00") === ((true, true)))
  }

  test("null valid_to + deleted + opday past: NOW drops; PAST needs fresh lm (F2b)") {
    assert(evalCase(None, "deleted", "2024-05-14",
      "2024-05-15 11:45:00") === ((false, true)))
    assert(evalCase(None, "deleted", "2024-05-14",
      "2024-05-10 00:00:00") === ((false, false)))
  }

  test("null valid_to + active → dropped in both (branch needs deleted)") {
    assert(evalCase(None, "active", "2024-05-16",
      "2024-05-15 11:45:00") === ((false, false)))
  }

  test("lookback boundary: lm exactly now − lookback is included (≥)") {
    assert(evalCase(Some("2024-05-01 00:00:00"), "active", "2024-05-16",
      "2024-05-15 11:30:00") === ((false, true)))
  }

  test("F7 flag drops non-cancellation types when enabled") {
    // same minimal case but with an off-type AD row: flag on → 0 rows
    val t = {
      val (keptNow, _) = evalCase(Some("2024-06-01 00:00:00"), "active",
        "2024-05-16", "2024-05-01 00:00:00")
      assert(keptNow)
    }
    val dc = Seq((1L, 21L, "2024-05-01 00:00:00", Some("2024-06-01 00:00:00"),
      "SOME_OTHER_TYPE", "2024-05-01 00:00:00"))
      .toDF("deviation_case_id", "bulletin_id", "valid_from", "valid_to",
        "type", "last_modified")
      .select(col("deviation_case_id"), col("bulletin_id"),
        col("valid_from").cast("timestamp"), col("valid_to").cast("timestamp"),
        col("type"), col("last_modified").cast("timestamp"))
    F.ensure(spark)
    val base = P.loadTables(spark, F.dir)
    val tables = base.copy(dc = dc)
    assert(P.snapshot(tables, P.FromNow, F.now, F.today, F.lookback,
      cancellationTypesOnly = true).count() === 0)
    assert(P.snapshot(tables, P.FromNow, F.now, F.today, F.lookback,
      cancellationTypesOnly = false).count() > 0)
  }
}
