package graft.streaming

import java.nio.file.Files
import java.time.Instant

import graft.SparkSpec
import graft.omm.{CancellationPipeline => P, OmmFixtures => F}

/** S5 polling semantics: per-poll now-binding, A2 cross-poll diff via
  * checkpointed state, keyed sink accumulation, and the streaming wrapper.
  */
class CancellationStreamSpec extends SparkSpec {

  // 2024-05-15 12:00 Helsinki (UTC+3) and two days later
  private val t1 = Instant.parse("2024-05-17T09:00:00Z")
  private val t2 = Instant.parse("2024-05-15T09:00:00Z")

  test("localNowStrings renders zone wall-clock") {
    assert(CancellationStream.localNowStrings(t2, F.zone) ===
      (("2024-05-15 12:00:00", "2024-05-15")))
    assert(CancellationStream.localNowStrings(t2, "UTC") ===
      (("2024-05-15 09:00:00", "2024-05-15")))
  }

  test("two polls: state diff matches the golden A2 counts") {
    F.ensure(spark)
    val base = Files.createTempDirectory("stream").toString
    val (sink, state) = (s"$base/sink", s"$base/state")

    // poll 1 at the later evaluation point (4 trips → 3 distinct: 601 ×2 cases)
    val r1 = CancellationStream.pollOnce(spark, F.dir, sink, state,
      P.FromNow, t1, F.lookbackSeconds, F.zone)
    assert(r1 === CancellationStream.PollResult(4, 3, 0))

    // poll 2 at the canonical now: trips 602, 604 are new; 601/603/613 repeat
    val r2 = CancellationStream.pollOnce(spark, F.dir, sink, state,
      P.FromNow, t2, F.lookbackSeconds, F.zone)
    assert(r2 === CancellationStream.PollResult(6, 2, 3))

    // keyed sink accumulated both polls
    val sunk = spark.read.parquet(sink)
    assert(sunk.count() === 10)
    assert(sunk.select("poll_time").distinct().count() === 2)
  }

  test("one poll evaluates the snapshot pipeline once: downstream actions " +
    "read the persisted InMemoryRelation") {
    F.ensure(spark)
    // replicate pollOnce's structure: persist + materialize, then check the
    // sink-side plan reads the cache instead of re-running the 10-join tree
    val deduped = P.run(spark, F.dir, P.FromNow, F.now, F.today,
      F.lookbackSeconds, F.zone).persist()
    try {
      deduped.count()
      val envPlan = P.envelope(P.sendOrdered(deduped))
        .queryExecution.executedPlan.toString
      assert(envPlan.contains("InMemoryTableScan"),
        "envelope action should scan the persisted dedup result, not " +
          "re-evaluate the snapshot pipeline")
      // the only parquet scans in the plan string are inside the
      // InMemoryRelation's *origin* subtree (printed for provenance) — the
      // executed path must hit the cache first
      assert(envPlan.indexOf("InMemoryTableScan") < envPlan.indexOf("Scan parquet"),
        "parquet scan precedes the cache scan — pipeline re-evaluated")
    } finally deduped.unpersist()
  }

  test("streaming wrapper runs polls on the trigger heartbeat") {
    F.ensure(spark)
    val base = Files.createTempDirectory("streamq").toString
    val q = CancellationStream.start(spark, F.dir, s"$base/sink",
      s"$base/state", s"$base/ckpt", P.FromNow,
      intervalSeconds = 1, lookbackSeconds = F.lookbackSeconds,
      zone = F.zone, nowProvider = () => t2)
    try {
      // wait for at least one completed micro-batch
      val deadline = System.currentTimeMillis() + 60000
      while (q.recentProgress.length < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(q.recentProgress.nonEmpty, "no micro-batch completed in 60s")
    } finally q.stop()
    val sunk = spark.read.parquet(s"$base/sink")
    assert(sunk.count() >= 6)
    assert(sunk.select("key").distinct().count() === 5)
  }
}
