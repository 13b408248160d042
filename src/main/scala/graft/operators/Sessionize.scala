package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-stream operator (assign a
  * session id whenever the inter-event gap exceeds `gapSeconds`), built
  * purely from window functions so the whole thing stays relational and
  * codegen'd: one shuffle on the key, lag → boundary flag → running sum.
  *
  * Spark's built-in `session_window` aggregation produces the same
  * sessions for grouped aggregates (asserted equivalent in
  * SessionizeSpec); this formulation additionally yields the per-EVENT
  * session assignment, which session_window cannot (it only aggregates).
  */
object Sessionize {

  /** Per-event session index (1-based per key) and a per-key event rank.
    * `tieBreak` makes the ordering total when timestamps collide. */
  def assignSessions(df: DataFrame, key: Seq[String], ts: Column,
                     tieBreak: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(ts.asc, tieBreak.asc)
    val prev = lag(ts, 1).over(w)
    val boundary = when(prev.isNull ||
      ts.cast("long") - prev.cast("long") > gapSeconds, 1).otherwise(0)
    df.withColumn("__new_session", boundary)
      .withColumn("session_idx",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-session aggregates: bounds, size, duration. */
  def sessionStats(df: DataFrame, key: Seq[String], ts: Column,
                   tieBreak: Column, gapSeconds: Long): DataFrame =
    assignSessions(df, key, ts, tieBreak, gapSeconds)
      .groupBy((key.map(col) :+ col("session_idx")): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        (max(ts.cast("long")) - min(ts.cast("long"))).as("duration_s"))

  /** The engagement dashboard's one-row rollup over [[sessionStats]]:
    * session count, bounce share (single-event sessions), mean events
    * per session, mean duration. Everything derives from exact long
    * sums of the session table in one further aggregate (the session
    * table itself is the only corpus-sized work); three snap-6
    * divisions at the end. */
  def sessionSummary(df: DataFrame, key: Seq[String], ts: Column,
                     tieBreak: Column, gapSeconds: Long): DataFrame =
    sessionStats(df, key, ts, tieBreak, gapSeconds)
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("n_events")).as("se"),
        sum(col("duration_s")).as("sd"))
      .select(col("n_sessions"), col("n_bounce"),
        round(col("n_bounce").cast("double") /
          col("n_sessions").cast("double"), 6).as("bounce_rate"),
        round(col("se").cast("double") /
          col("n_sessions").cast("double"), 6).as("mean_events"),
        round(col("sd").cast("double") /
          col("n_sessions").cast("double"), 6).as("mean_duration_s"))
}
