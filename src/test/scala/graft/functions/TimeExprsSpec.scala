package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** U1–U3 timezone + P5–P8 service-day time semantics, including the 4
  * asserts of the reference's OmmConnectorTest.java:11–17 and DST-boundary
  * epoch conversion.
  */
class TimeExprsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    spark.range(1).select(c.cast("string")).as[String].head()

  // OmmConnectorTest.java:12–16: instant → local wall-clock string
  test("localDatetimeAsString matches the reference's 4 asserts") {
    def fmt(epochSec: Long, zone: String): String =
      one(TimeExprs.localDatetimeAsString(
        timestamp_seconds(lit(epochSec)), zone))
    assert(fmt(1541415600L, "Europe/Helsinki") === "2018-11-05 13:00:00")
    assert(fmt(1541422800L, "UTC") === "2018-11-05 13:00:00")
    assert(fmt(1514764800L, "UTC") === "2018-01-01 00:00:00")
    assert(fmt(1514843999L, "Europe/Helsinki") === "2018-01-01 23:59:59")
  }

  test("toUtcEpochMs converts Helsinki wall-clock, both DST offsets") {
    def ms(local: String): Long =
      spark.range(1).select(TimeExprs.toUtcEpochMs(
        lit(local).cast("timestamp"), "Europe/Helsinki")).as[Long].head()
    // winter: UTC+2 → 2018-11-05 13:00 local = 11:00Z
    assert(ms("2018-11-05 13:00:00") === 1541415600000L)
    // summer: UTC+3 → 2018-07-01 13:00 local = 10:00Z
    assert(ms("2018-07-01 13:00:00") === 1530439200000L)
    // DST spring-forward day, before the 03:00→04:00 gap: still UTC+2
    assert(ms("2018-03-25 02:59:00") === 1521939540000L)
    // after the gap: UTC+3
    assert(ms("2018-03-25 05:00:00") === 1521943200000L)
  }

  test("toUtcEpochMs propagates null (row-drop contract, F9)") {
    val out = spark.range(1).select(TimeExprs.toUtcEpochMs(
      lit(null).cast("timestamp"), "Europe/Helsinki").as("ms"))
    assert(out.filter(col("ms").isNull).count() === 1)
  }

  test("localDateAsString crosses the midnight boundary with the zone") {
    // 2018-01-01 23:30Z = 2018-01-02 01:30 Helsinki
    val c = TimeExprs.localDateAsString(
      lit("2018-01-01 23:30:00").cast("timestamp"), "Europe/Helsinki")
    assert(one(c) === "2018-01-02")
  }

  test("style112 renders yyyyMMdd") {
    assert(one(TimeExprs.style112(lit("2024-05-16").cast("date"))) === "20240516")
  }

  test("serviceDayTime is not taken mod 24 (Jore 28:15:00)") {
    val base = lit("1900-01-01 00:00:00").cast("timestamp")
    assert(one(TimeExprs.serviceDayTime(base,
      lit("1900-01-02 04:15:00").cast("timestamp"))) === "28:15:00")
    assert(one(TimeExprs.serviceDayTime(base,
      lit("1900-01-01 08:30:00").cast("timestamp"))) === "08:30:00")
    assert(one(TimeExprs.serviceDayTime(base,
      lit("1900-01-01 00:05:00").cast("timestamp"))) === "00:05:00")
  }
}
