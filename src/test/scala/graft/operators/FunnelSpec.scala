package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ordered funnel + weekly retention (Funnel): strict stage ordering
  * (events before the previous stage's conversion do NOT count), rate
  * arithmetic, and cohort cell/retention values on a hand-checked
  * fixture. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // u1 converts fully in order; u2 purchases BEFORE clicking (purchase
  // must not count); u3 views only; u4 never views (excluded entirely,
  // even though it clicks)
  private val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    (2L, ts("2024-01-01 09:00:00"), "purchase"),
    (2L, ts("2024-01-01 10:00:00"), "view"),
    (2L, ts("2024-01-01 11:00:00"), "click"),
    (3L, ts("2024-01-01 12:00:00"), "view"),
    (4L, ts("2024-01-01 12:00:00"), "click"))
    .toDF("user_id", "ts", "event_type")

  test("strict-order funnel counts and rates") {
    val got = Funnel.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .as[(Int, String, Long, Double, Double)].collect()
      .sortBy(_._1)
    assert(got.map(r => (r._2, r._3)).toSeq ===
      Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
    assert(got.map(_._4).toSeq === Seq(1.0, 0.666667, 0.5))
    assert(got.map(_._5).toSeq === Seq(1.0, 0.666667, 0.333333))
  }

  test("conversion strictly after: same-instant events do not convert") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(e, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click"))
      .as[(Int, String, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq === Seq(1L, 0L))
  }

  test("windowed funnel: conversion only within maxGap of the previous stage") {
    // u1 clicks 5 min after viewing (inside a 10-min window); u2 (1h)
    // and u5 (30 min) click outside it — both convert unbounded only
    val e = events.union(Seq(
      (5L, ts("2024-01-01 10:00:00"), "view"),
      (5L, ts("2024-01-01 10:30:00"), "click"))
      .toDF("user_id", "ts", "event_type"))
    val unbounded = Funnel.funnel(e, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click"))
      .as[(Int, String, Long, Double, Double)].collect().sortBy(_._1)
    val windowed = Funnel.funnelWithin(e, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click"), maxGapSeconds = 600L)
      .as[(Int, String, Long, Double, Double)].collect().sortBy(_._1)
    assert(unbounded.map(_._3).toSeq === Seq(4L, 3L))
    assert(windowed.map(_._3).toSeq === Seq(4L, 1L))
  }

  test("windowed funnel: boundary instant (exactly maxGap later) converts") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelWithin(e, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click"), maxGapSeconds = 600L)
      .as[(Int, String, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq === Seq(1L, 1L))
  }

  test("last-touch attribution: latest touch wins, lookback and no-touch " +
    "fall to unattributed, values sum in cents") {
    val e = Seq(
      // u1: view then click then purchase 10 min after the click →
      // 'click' gets the credit (latest touch), value 10.01
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (2L, 1L, ts("2024-01-01 10:05:00"), "click", 0.0),
      (3L, 1L, ts("2024-01-01 10:15:00"), "purchase", 10.01),
      // u2: view 3h before the purchase → outside the 1h lookback
      (4L, 2L, ts("2024-01-01 07:00:00"), "view", 0.0),
      (5L, 2L, ts("2024-01-01 10:00:00"), "purchase", 5.5),
      // u3: purchase with no touch at all
      (6L, 3L, ts("2024-01-01 10:00:00"), "purchase", 2.25),
      // u1 again: second purchase, still within 1h of the same click
      (7L, 1L, ts("2024-01-01 10:30:00"), "purchase", 1.99))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Funnel.lastTouchAttribution(e, col("user_id"), col("ts"),
        col("event_type"), col("event_id"), col("value"),
        "purchase", Seq("view", "click"), lookbackSeconds = 3600L)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("click", 2L, 12.0), ("unattributed", 2L, 7.75)))
  }

  test("attribution tie at the same instant: max event_id's channel wins") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (2L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (3L, 1L, ts("2024-01-01 10:00:30"), "purchase", 4.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Funnel.lastTouchAttribution(e, col("user_id"), col("ts"),
        col("event_type"), col("event_id"), col("value"),
        "purchase", Seq("view", "click"), lookbackSeconds = 3600L)
      .as[(String, Long, Double)].collect()
    assert(got.toSeq === Seq(("click", 1L, 4.0)))
  }

  test("transition matrix: per-key adjacency counts, row-normalized") {
    // u1: a→b→a ; u2: a→b — transitions a→b ×2, b→a ×1; keys never mix
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "a"),
      (4L, 2L, ts("2024-01-01 09:00:00"), "a"),
      (5L, 2L, ts("2024-01-01 09:30:00"), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.transitionMatrix(e, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .as[(String, String, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
    // same-instant tie: event_id orders the pair deterministically
    val tie = Seq(
      (2L, 1L, ts("2024-01-01 10:00:00"), "y"),
      (1L, 1L, ts("2024-01-01 10:00:00"), "x"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val t = Funnel.transitionMatrix(tie, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .as[(String, String, Long, Double)].collect()
    assert(t.toSeq === Seq(("x", "y", 1L, 1.0)))
  }

  test("weekly retention: cohort cells and rates") {
    // weeks (Mondays): 2024-01-01, 2024-01-08, 2024-01-15
    val e = Seq(
      (1L, ts("2024-01-02 10:00:00")), // cohort w0
      (1L, ts("2024-01-09 10:00:00")), // active w1
      (1L, ts("2024-01-16 10:00:00")), // active w2
      (2L, ts("2024-01-03 10:00:00")), // cohort w0
      (2L, ts("2024-01-17 10:00:00")), // active w2 (skips w1)
      (3L, ts("2024-01-10 10:00:00"))) // cohort w1
      .toDF("user_id", "ts")
    val got = Funnel.weeklyRetention(e, col("user_id"), col("ts"))
      .as[(String, Int, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0, 2L, 1.0),
      ("2024-01-01", 1, 1L, 0.5),
      ("2024-01-01", 2, 2L, 1.0),
      ("2024-01-08", 0, 1L, 1.0)))
  }

  test("activeUsers: exact DAU and rolling WAU on a hand calendar") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      ("u1", "2024-01-01 10:00:00"), ("u1", "2024-01-01 11:00:00"),
      ("u2", "2024-01-01 09:00:00"), ("u1", "2024-01-04 08:00:00"),
      ("u3", "2024-01-09 12:00:00")
    ).toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val got = Funnel.activeUsers(ev, col("user_id"), col("ts"), 7)
      .select(col("day").cast("string"), col("dau"), col("wau"))
      .collect().map(_.toSeq).toSet
    // WAU(1/1)={u1,u2}; WAU(1/4)={u1 (1/1 and 1/4), u2 (1/1)};
    // WAU(1/9)={u1 (1/4), u3}
    assert(got === Set(
      Seq("2024-01-01", 2L, 2L),
      Seq("2024-01-04", 1L, 2L),
      Seq("2024-01-09", 1L, 2L)))
  }

  test("volumeAnomaly: leave-one-out stats — the spike day cannot " +
    "mask itself; constant history flags any deviation; single-day " +
    "types have no baseline") {
    import org.apache.spark.sql.functions._
    def day(d: Int, n: Int, t: String) =
      (0 until n).map(i => (t, f"2024-01-0$d 00:$i%02d:00"))
    // A: 10, 10, 40 per day. Day 3 LOO baseline = {10, 10}: σ = 0 and
    // 40 ≠ 10 → spike (the leave-in form gave |dev| = 1.41 < 2 — the
    // spike dragged its own σ). Days 1/2 LOO = {10, 40}: mean 25,
    // σ 15, dev -1. B: 5, 5 → each day's LOO = {5}: σ 0, no deviation.
    // C: one day → no baseline.
    val ev = (day(1, 10, "A") ++ day(2, 10, "A") ++ day(3, 40, "A") ++
      day(1, 5, "B") ++ day(2, 5, "B") ++ day(1, 3, "C"))
      .toDF("event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Funnel.volumeAnomaly(ev, col("event_type"), col("ts"),
      z = 1.0)
      .select(col("event_type"), col("day").cast("string"), col("n"),
        col("dev"), col("is_spike"))
      .collect().map(_.toSeq).toSet
    assert(got === Set(
      Seq("A", "2024-01-01", 10L, -1.0, false),
      Seq("A", "2024-01-02", 10L, -1.0, false),
      Seq("A", "2024-01-03", 40L, null, true),
      Seq("B", "2024-01-01", 5L, null, false),
      Seq("B", "2024-01-02", 5L, null, false),
      Seq("C", "2024-01-01", 3L, null, false)))
  }

  test("volumeAnomalyFromCounts: constant history detected " +
    "structurally — counts past 2^26 (n² > 2^53 rounds in double) " +
    "must not z-test against a phantom near-zero sigma") {
    import org.apache.spark.sql.functions._
    // 2^27 + 1: n² is NOT double-representable, so the IEEE sd of a
    // constant history lands at a tiny nonzero value; the decimal
    // (d−1)·(Σn²−nᵢ²) = (Σn−nᵢ)² test is exact
    val big = (1L << 27) + 1L
    val cnt = Seq(("A", 0L, big), ("A", 1L, big), ("A", 2L, big))
      .toDF("t", "dd", "n")
    val got = Funnel.volumeAnomalyFromCounts(cnt, z = 2.0)
      .select(col("n"), col("dev"), col("is_spike"))
      .collect().map(_.toSeq).toSet
    // every LOO baseline is {big, big}: constant, zero deviation
    assert(got === Set(Seq(big, null, false)))
  }
}
