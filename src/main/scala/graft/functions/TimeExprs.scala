package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time / timezone scalar expressions (SURVEY.md §2.2 P5–P8, §2.8 U1–U3).
  *
  * Re-expresses the reference's T-SQL scalar quirks and Java timezone helpers
  * as composed built-in `Column` functions (codegen'd, no UDFs):
  *  - U1 `toUtcEpochMs` ≙ OmmCancellationHandler.java:79–97 (local wall-clock
  *    string in `omm.timezone` → UTC epoch millis; DST handled by zone rules).
  *  - U2/U3 `localDatetimeAsString`/`localDateAsString` ≙ OmmConnector.java:53–59
  *    (per-poll "now" parameter rendering).
  *  - P5 `style112` ≙ `CONVERT(CHAR(8), d, 112)` (cancellations_current_future.sql:16).
  *  - P6–P8 `serviceDayTime` ≙ the DATEDIFF-since-1900 decomposition at
  *    cancellations_current_future.sql:17–19 — NOT a time-of-day: hours are not
  *    taken mod 24 (Jore >24 h service-day times like "28:15:00").
  *
  * All functions assume `spark.sql.session.timeZone=UTC` so naive timestamps
  * round-trip without implicit shifts (SURVEY.md §7 hard part 2).
  */
object TimeExprs {

  /** U1: naive local timestamp in `zone` → UTC epoch milliseconds.
    * Null / unparseable input propagates null (caller filters ≙ row drop,
    * OmmCancellationHandler.java:154–160). */
  def toUtcEpochMs(ts: Column, zone: String): Column =
    unix_millis(to_utc_timestamp(ts, zone))

  /** U2: instant → "yyyy-MM-dd HH:mm:ss" wall-clock string in `zone`. */
  def localDatetimeAsString(utcTs: Column, zone: String): Column =
    date_format(from_utc_timestamp(utcTs, zone), "yyyy-MM-dd HH:mm:ss")

  /** U3: instant → "yyyy-MM-dd" local date string in `zone`. */
  def localDateAsString(utcTs: Column, zone: String): Column =
    date_format(from_utc_timestamp(utcTs, zone), "yyyy-MM-dd")

  /** P5: T-SQL CONVERT style 112 — `yyyyMMdd`. */
  def style112(d: Column): Column = date_format(d, "yyyyMMdd")

  /** P7: zero-pad-left to 2 chars ≙ `RIGHT('0' + CONVERT(VARCHAR(2), x), 2)`.
    * Like the T-SQL original, values over 2 digits are truncated (VARCHAR(2)). */
  def zeroPad2(x: Column): Column = lpad(x.cast("string"), 2, "0")

  /** Integral division on longs (SQL `div`) — exact, no floating point. */
  private def longDiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Whole minutes elapsed from `base` to `ts` (integer floor division on
    * microsecond epochs — exact, no floating point). */
  def minutesSince(base: Column, ts: Column): Column =
    longDiv(unix_micros(ts) - unix_micros(base), lit(60000000L))

  /** P6+P7+P8: "HH:mm:00" where HH = whole hours since `base`, NOT mod 24
    * (≙ cancellations_current_future.sql:17–19; supports `28:15:00`).
    * Like the reference's VARCHAR(2), HH wider than 2 digits is truncated. */
  def serviceDayTime(base: Column, ts: Column): Column = {
    val mins = minutesSince(base, ts)
    concat(zeroPad2(longDiv(mins, lit(60L))), lit(":"),
      zeroPad2(mins % 60L), lit(":00"))
  }
}
