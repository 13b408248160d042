package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import ChangeTracker._

/** Stateful change detection over a MemoryStream: per-batch transitions
  * (new → changed → suppressed repeat) through real checkpointed state. */
class ChangeTrackerSpec extends SparkSpec {
  import spark.implicits._

  test("emits new / changed, suppresses identical repeats across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TripUpdate]
    val changes = track(input.toDS(), ttlMs = 0) // TTL off: bounded drain

    // default trigger: each addData + processAllAvailable = one micro-batch
    val q = changes.writeStream
      .format("memory").queryName("trip_changes")
      .outputMode("append")
      .start()

    def drain(): Unit = { q.processAllAvailable() }
    def results(): Seq[TripChange] =
      spark.table("trip_changes").as[TripChange].collect().toSeq

    // batch 1: two new trips
    input.addData(TripUpdate("601", "CANCELED", 1000L),
      TripUpdate("602", "RUNNING", 1000L))
    drain()
    assert(results().map(c => (c.trip_id, c.change)).sorted ===
      Seq(("601", "new"), ("602", "new")))

    // batch 2: 601 repeats (suppressed), 602 flips, 603 appears
    input.addData(TripUpdate("601", "CANCELED", 2000L),
      TripUpdate("602", "CANCELED", 2000L),
      TripUpdate("603", "RUNNING", 2000L))
    drain()
    val r2 = results()
    assert(r2.length === 4)
    assert(r2.find(c => c.trip_id == "602" && c.change == "changed")
      .exists(c => c.status == "CANCELED" && c.prev_status == "RUNNING"))
    assert(!r2.exists(c => c.trip_id == "601" && c.change == "repeat"))

    // batch 3: within-batch dedup — latest update wins
    input.addData(TripUpdate("603", "CANCELED", 3000L),
      TripUpdate("603", "RUNNING", 2500L))
    drain()
    val r3 = results()
    assert(r3.find(c => c.trip_id == "603" && c.change == "changed")
      .exists(_.status === "CANCELED"))
    q.stop()
  }
}
