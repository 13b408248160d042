package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val points = Seq(
    (1L, "a", ts("2024-01-01 10:30:00")), // inside iv1
    (2L, "a", ts("2024-01-01 11:00:00")), // boundary: end of iv1, start of iv2
    (3L, "a", ts("2024-01-01 13:30:00")), // inside no interval
    (4L, "b", ts("2024-01-01 10:30:00")), // same time as p1 but other key
    (5L, "a", ts("2024-01-02 09:00:00"))  // inside the long iv3 (many buckets)
  ).toDF("pid", "k", "t")

  private lazy val intervals = Seq(
    ("a", 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // iv1
    ("a", 11L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")), // iv2
    ("a", 12L, ts("2024-01-01 20:00:00"), ts("2024-01-02 20:00:00")), // iv3 long
    ("b", 20L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
    ("a", 30L, ts("2024-01-01 15:00:00"), ts("2024-01-01 14:00:00"))  // end<start: dropped
  ).toDF("k", "iid", "s", "e")

  private lazy val pairs = RangeJoin.pointInIntervalJoin(points, intervals,
      Seq("k"), "t", "s", "e", bucketSeconds = 3600L)
    .select($"pid", $"iv_iid").as[(Long, Long)].collect().toSet

  test("points match exactly the intervals containing them (closed ends)") {
    assert(pairs === Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 20L), (5L, 12L)))
  }

  test("intervals spanning many buckets still yield each pair exactly once") {
    val longMatches = RangeJoin.pointInIntervalJoin(points, intervals,
        Seq("k"), "t", "s", "e", bucketSeconds = 3600L)
      .filter($"iv_iid" === 12L).count()
    assert(longMatches === 1L)
  }

  test("plan is an equi-join on (key, bucket), not a range BNLJ") {
    val plan = RangeJoin.pointInIntervalJoin(points, intervals,
        Seq("k"), "t", "s", "e", bucketSeconds = 3600L)
      .queryExecution.executedPlan.toString
    Seq("BroadcastNestedLoopJoin", "CartesianProduct").foreach(n =>
      assert(!plan.contains(n), s"range join degenerated to $n"))
  }
}
