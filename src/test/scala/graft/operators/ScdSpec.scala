package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD2 interval build (Scd.scd2): no-op suppression, lead-closed
  * intervals, exactly one current version per key, and interval chaining
  * (each valid_to equals the key's next valid_from). */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // key 1: a→a→b→b→a (two no-ops suppressed, an attribute that RETURNS
  // to an old value must open a NEW version); key 2: single event
  private val rows = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
    (1L, ts("2024-01-01 11:00:00"), 2L, "a", 2.0),
    (1L, ts("2024-01-01 12:00:00"), 3L, "b", 3.0),
    (1L, ts("2024-01-01 13:00:00"), 4L, "b", 4.0),
    (1L, ts("2024-01-01 14:00:00"), 5L, "a", 5.0),
    (2L, ts("2024-01-02 09:00:00"), 6L, "x", 6.0))

  private def build() = Scd.scd2(
    rows.toDF("user_id", "ts", "event_id", "event_type", "value"),
    Seq("user_id"), col("ts"), col("event_id"), col("event_type"),
    Seq(col("value")))
    .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Double)]
    .collect().sortBy(r => (r._1, r._3.getTime))

  test("no-op changes are suppressed; returning values reopen versions") {
    val got = build()
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, "a"), (1L, "b"), (1L, "a"), (2L, "x")))
    // the carried column is the version-OPENING event's value
    assert(got.map(_._6).toSeq === Seq(1.0, 3.0, 5.0, 6.0))
  }

  test("intervals chain per key and exactly the last version is current") {
    val got = build()
    got.groupBy(_._1).foreach { case (_, vs) =>
      vs.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev._4.contains(next._3),
            s"valid_to of $prev must equal valid_from of $next")
        case _ => ()
      }
      assert(vs.init.forall(!_._5) && vs.last._5)
      assert(vs.last._4.isEmpty)
    }
  }
}
