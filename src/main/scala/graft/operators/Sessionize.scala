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

  /** Session-level association rules over event TYPES (market-basket on
    * the session grain): for every ordered type pair (lhs, rhs) that
    * co-occurs in a session, `(lhs, rhs, n_both, support, confidence,
    * lift)` — support = co-sessions / sessions, confidence =
    * P(rhs-session | lhs-session), lift = confidence / P(rhs-session).
    * Lift ≪ 1 on a pair the funnel assumes adjacent means the funnel's
    * stage order is wrong for real traffic. Both directions are
    * emitted (confidence is asymmetric).
    *
    * Scale shape: the session assignment window is the ONE corpus-sized
    * shuffle (shared with [[sessionStats]]); everything after runs on
    * the distinct (session, type) item grain — self-join keyed on the
    * session id with ≤ |type alphabet| items per key, then
    * types²-bounded rule rows. Exact long counts; the three ratios are
    * fixed IEEE sequences snapped to 6. */
  def associationRules(df: DataFrame, key: Seq[String], ts: Column,
                       tieBreak: Column, typ: Column,
                       gapSeconds: Long): DataFrame = {
    // null session-key rows are DROPPED before the struct key is built:
    // struct equality would otherwise glue every null-key event into
    // one pseudo-session (struct fields compare null == null in
    // joins/distinct), which no relational oracle replays
    val nonNull = df.filter(key.map(col(_).isNotNull).reduce(_ && _))
    val items = assignSessions(nonNull, key, ts, tieBreak, gapSeconds)
      .select(struct((key.map(col) :+ col("session_idx")): _*).as("sid"),
        typ.as("t"))
      .filter(col("t").isNotNull)
      .distinct()
    val tot = items.select(col("sid")).distinct()
      .agg(count(lit(1)).as("s"))
    val singles = items.groupBy(col("t")).agg(count(lit(1)).as("n1"))
    val pairs = items.select(col("sid"), col("t").as("ta"))
      .join(items.select(col("sid"), col("t").as("tb")), Seq("sid"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_both"))
    val rules = pairs.select(col("ta").as("lhs"), col("tb").as("rhs"),
        col("n_both"))
      .unionByName(pairs.select(col("tb").as("lhs"),
        col("ta").as("rhs"), col("n_both")))
    rules
      .join(broadcast(singles.select(col("t").as("lhs"),
        col("n1").as("nl"))), Seq("lhs"))
      .join(broadcast(singles.select(col("t").as("rhs"),
        col("n1").as("nr"))), Seq("rhs"))
      .crossJoin(broadcast(tot))
      .select(col("lhs"), col("rhs"), col("n_both"),
        round(col("n_both").cast("double") /
          col("s").cast("double"), 6).as("support"),
        round(col("n_both").cast("double") /
          col("nl").cast("double"), 6).as("confidence"),
        round((col("n_both").cast("double") * col("s").cast("double")) /
          (col("nl").cast("double") * col("nr").cast("double")), 6)
          .as("lift"))
  }

  /** Inter-arrival cadence panel — per event type, exact median and
    * p90 of the gap (seconds) between a key's CONSECUTIVE events, the
    * gap attributed to the LATER event's type: the number a session
    * `gapSeconds` (and any poll/retry budget) is actually tuned
    * against, measured instead of folklore'd. Row:
    * `(event_type, n_gaps, median_gap_s, p90_gap_s)`.
    *
    * Scale shape: one key-partitioned lag window (the corpus-sized
    * shuffle) collapses to the `(type, gap)` DISTINCT-VALUE count
    * table; both percentiles are frequency-weighted EXACT
    * rank-interpolated percentiles over that bounded table (the q177
    * robust-outliers discipline — integer-second gaps make every
    * interpolation exact IEEE in any engine). */
  def interArrival(df: DataFrame, key: Seq[String], ts: Column,
                   tieBreak: Column, typ: Column): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(ts.asc, tieBreak.asc)
    val gap = ts.cast("long") - lag(ts, 1).over(w).cast("long")
    // null keys would collapse into ONE window partition and produce
    // gaps between unrelated key-less events — drop them before the
    // lag, the associationRules null-key contract
    val cnts = df
      .filter(key.map(col(_).isNotNull).reduce(_ && _))
      .select(typ.as("t"), gap.as("g"))
      .filter(col("t").isNotNull && col("g").isNotNull)
      .groupBy(col("t"), col("g")).agg(count(lit(1)).as("c"))
    cnts.groupBy(col("t").as("event_type"))
      .agg(sum(col("c")).as("n_gaps"),
        percentile(col("g").cast("double"), lit(0.5), col("c"))
          .as("med"),
        percentile(col("g").cast("double"), lit(0.9), col("c"))
          .as("p90"))
      .select(col("event_type"), col("n_gaps"),
        round(col("med"), 6).as("median_gap_s"),
        round(col("p90"), 6).as("p90_gap_s"))
  }
}
