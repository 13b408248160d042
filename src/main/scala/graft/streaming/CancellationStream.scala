package graft.streaming

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneId

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.omm.{CancellationPipeline => P}
import graft.operators.Dedup

/** S5/S4: the polling scheduler re-expressed as Structured Streaming
  * micro-batches (≙ Main.java:25,53–66 scheduleAtFixedRate + the Pulsar
  * producer sink, OmmCancellationHandler.java:228–254).
  *
  * Spark has no streaming JDBC/snapshot source, so (per SURVEY.md §7) each
  * micro-batch re-evaluates the snapshot pipeline with a freshly bound
  * `now` (S2's per-poll parameter binding) inside `foreachBatch`; the rate
  * source is only the trigger heartbeat. Cross-poll state (A2's
  * `previousCancellations`, Hand:22/225) lives in a checkpointed parquet
  * key set — restart-safe where the reference's in-memory list was not
  * (SURVEY.md §7 hard part 6).
  *
  * Fail-fast contract: any poll exception propagates and stops the
  * streaming query (≙ Main.java:56–65 shutdown-on-error).
  */
object CancellationStream {

  /** U2/U3 driver-side: render the per-poll instant as wall-clock strings
    * in the OMM zone (≙ OmmConnector.java:53–59). */
  def localNowStrings(instant: Instant, zone: String): (String, String) = {
    val z = instant.atZone(ZoneId.of(zone))
    (z.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")),
      z.format(DateTimeFormatter.ofPattern("yyyy-MM-dd")))
  }

  case class PollResult(sent: Long, newTrips: Long, repeatedTrips: Long)

  /** One poll ≙ one micro-batch: snapshot → parse → dedup, A2 diff against
    * the previous poll's key set, append the envelope to the keyed sink,
    * replace the state. Returns the per-poll counts (A3 metrics,
    * ≙ Hand:223–224). */
  /** Slow-poll warning threshold ≙ OmmConnector.java:86–89. */
  val slowPollWarnMs = 4000L

  def pollOnce(spark: SparkSession, tablesDir: String, sinkDir: String,
               stateDir: String, mode: P.Mode, nowInstant: Instant,
               lookbackSeconds: Long, zone: String,
               tableLoader: Option[SparkSession => P.OmmTables] = None): PollResult = {
    val t0 = System.nanoTime()
    val (now, today) = localNowStrings(nowInstant, zone)
    // PAST-mode lookback: subtract on the Instant, render in the zone
    // (≙ OmmConnector.java:76) — wall-clock subtraction would drift across
    // DST transitions.
    val lookback = nowInstant.minusSeconds(lookbackSeconds)
      .atZone(ZoneId.of(zone))
      .format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    // One poll = ONE evaluation of the 10-join snapshot+parse+dedup: the
    // result is persisted, the first action below materializes the cache,
    // and the diff/count/sink/state actions all read the InMemoryRelation
    // (asserted in CancellationStreamSpec). Without the persist each action
    // re-ran the whole pipeline — 4 evaluations per poll, the first thing
    // to blow the 30 s poll budget at scale.
    val tables = tableLoader.getOrElse(
      (s: SparkSession) => P.loadTables(s, tablesDir))(spark)
    val deduped = P.dedup(P.parse(
      P.snapshot(tables, mode, now, today, lookback), zone))
      .persist()
    try {
      val sent = deduped.count() // materializes the cache

      // A2: hash anti-join against the checkpointed previous key set.
      val prevKeys: Option[DataFrame] =
        if (new java.io.File(stateDir).exists)
          Some(spark.read.parquet(stateDir))
        else None
      val (newT, repT) = prevKeys match {
        case Some(prev) =>
          val d = Dedup.batchDiffCounts(deduped, prev, "trip_id")
            .collect()(0)
          (d.getLong(0), d.getLong(1))
        case None => (deduped.select("trip_id").distinct().count(), 0L)
      }

      // S4: keyed envelope appended per poll (≙ per-record producer.send),
      // in DC.last_modified send order (O1, applied here at the sink).
      P.envelope(P.sendOrdered(deduped))
        .withColumn("poll_time", lit(now))
        .write.mode("append").parquet(sinkDir)

      // Replace state AFTER the sink write (at-least-once on restart — the
      // reference's semantics are also at-least-once, SURVEY.md §2.9).
      val tmp = stateDir + "_next"
      deduped.select("trip_id").distinct()
        .write.mode("overwrite").parquet(tmp)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(stateDir), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(stateDir))

      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      if (elapsedMs > slowPollWarnMs)
        println(s"[warn] poll took ${elapsedMs} ms (query+process+send " +
          s"> $slowPollWarnMs ms threshold)")
      PollResult(sent, newT, repT)
    } finally deduped.unpersist()
  }

  /** Start the polling stream: fixed-rate micro-batches every
    * `intervalSeconds` (≙ omm.interval, environment.conf:21–22). */
  def start(spark: SparkSession, tablesDir: String, sinkDir: String,
            stateDir: String, checkpointDir: String, mode: P.Mode,
            intervalSeconds: Int, lookbackSeconds: Long, zone: String,
            nowProvider: () => Instant = () => Instant.now(),
            tableLoader: Option[SparkSession => P.OmmTables] = None): StreamingQuery =
    spark.readStream
      .format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        val r = pollOnce(spark, tablesDir, sinkDir, stateDir, mode,
          nowProvider(), lookbackSeconds, zone, tableLoader)
        // A3: per-poll counts (≙ Hand:223–224 log line)
        println(s"[poll $batchId] sent=${r.sent} new=${r.newTrips} " +
          s"repeated=${r.repeatedTrips}")
      }
      .start()
}
