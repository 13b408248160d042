package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TimeExprs, VectorExprs}
import graft.operators.{Dedup, NearDup, Similarity}
import graft.sources.Tables

/** Event analytics: funnels, retention, attribution, sessions, SCD2, as-of/range joins, trends, anomalies, A/B.
  *
  * One domain slice of the query registry (split from the single-file
  * registry in round 15 — same members, same semantics). Members are
  * `private[queries]` so cross-domain references keep working; `val`s
  * became `lazy val`s so initialization is order-independent across the
  * trait mix-in. Mixed into [[TestdataQueries]], which owns the maps.
  */
private[queries] trait TdqEvents { this: TestdataQueries.type =>

  // ------------------------------------------------- as-of join (§2.10 ext)
  // For each click, the user's most recent purchase at-or-before the click.
  // The right side is deduped to one row per (user, ts) so the match is a
  // total function (both engines agree on ties). Oracle: DuckDB's native
  // ASOF LEFT JOIN.
  private[queries] lazy val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private[queries] def q42AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pts"))
      .agg(min(col("event_id")).as("purchase_id"))
    graft.operators.AsOfJoin.asofJoin(clicks, purchases,
        Seq("user_id"), "ts", "pts")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("ts_str"),
        col("asof_purchase_id"),
        date_format(col("asof_pts"), tsFmt).as("pts_str"))
  }

  private[queries] lazy val q42Sql =
    """WITH c AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, ts AS pts, min(event_id) AS purchase_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT c.event_id, c.user_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
      |  p.purchase_id AS asof_purchase_id,
      |  strftime(p.pts, '%Y-%m-%d %H:%M:%S.%f') AS pts_str
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.pts""".stripMargin

  // ---------------------------------------------- sessionization (§2.10 ext)
  private[queries] def q43Sessionize(s: SparkSession, d: String): DataFrame =
    graft.operators.Sessionize.sessionStats(Tables.events(s, d),
        Seq("user_id"), col("ts").cast("timestamp"), col("event_id"),
        gapSeconds = 3600L)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        date_format(col("session_start"), tsFmt).as("start_str"),
        date_format(col("session_end"), tsFmt).as("end_str"),
        col("duration_s"))

  private[queries] lazy val q43Sql =
    """WITH b AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_ms(ts) // 1000 - epoch_ms(lag(ts) OVER w) // 1000 > 3600
      |         THEN 1 ELSE 0 END AS nb
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      |  FROM b)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_str,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_str,
      |  max(epoch_ms(ts) // 1000) - min(epoch_ms(ts) // 1000) AS duration_s
      |FROM s GROUP BY user_id, session_idx""".stripMargin

  // ------------------------------------------- range join (§2.10 ext)
  // Clicks matched to every same-user purchase window [pts, pts+1h] that
  // contains them — bucketed interval join (one bucket per point, interval
  // replicated per covered bucket, equi-join + exact containment filter).
  private[queries] def q45RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val windows = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pstart"))
      .agg(min(col("event_id")).as("purchase_id"))
      .withColumn("pend", col("pstart") + expr("INTERVAL 3600 SECONDS"))
    graft.operators.RangeJoin.pointInIntervalJoin(clicks, windows,
        Seq("user_id"), "ts", "pstart", "pend", bucketSeconds = 3600L)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("ts_str"),
        col("iv_purchase_id"),
        date_format(col("iv_pstart"), tsFmt).as("pstart_str"))
  }

  private[queries] lazy val q45Sql =
    """WITH c AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, ts AS pstart, min(event_id) AS purchase_id,
      |    ts + INTERVAL 3600 SECONDS AS pend
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT c.event_id, c.user_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
      |  p.purchase_id AS iv_purchase_id,
      |  strftime(p.pstart, '%Y-%m-%d %H:%M:%S.%f') AS pstart_str
      |FROM c JOIN p ON c.user_id = p.user_id
      |  AND p.pstart <= c.ts AND c.ts <= p.pend""".stripMargin

  // ------------------- SCD2 history build (§2.10 ext)
  // Change-event stream → validity intervals: the warehouse MERGE/SCD
  // type-2 pattern (no-op suppression, lead-closed intervals). Two
  // key-partitioned windows over ONE reused exchange; raw columns only,
  // so no float discipline needed.
  private[queries] def q190Scd2(s: SparkSession, d: String): DataFrame =
    graft.operators.Scd.scd2(Tables.events(s, d), Seq("user_id"),
      col("ts"), col("event_id"), col("event_type"), Seq(col("value")))

  private[queries] lazy val q190Sql =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |ch AS (SELECT user_id, ts, event_id, event_type, value FROM ordered
      |       WHERE prev IS NULL OR event_type <> prev)
      |SELECT user_id, event_type AS version_value, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    AS is_current,
      |  value
      |FROM ch""".stripMargin

  // ------------------- ordered funnel conversion (§2.10 ext)
  // view → click → purchase with STRICT ordering (stage i+1 counts only
  // after the stage-i conversion instant). Stage filters push to the
  // scan; every join is on the entity key; rates are IEEE divisions of
  // exact longs.
  private[queries] lazy val q191Stages = Seq("view", "click", "purchase")

  private[queries] def q191Funnel(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.funnel(Tables.events(s, d), col("user_id"),
      col("ts"), col("event_type"), q191Stages)

  private[queries] lazy val q191Sql =
    """WITH s1 AS (SELECT user_id AS k, min(ts) AS t FROM events
      |  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1),
      |s2 AS (SELECT e.user_id AS k, min(e.ts) AS t FROM events e
      |  JOIN s1 ON e.user_id = s1.k AND e.ts > s1.t
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |s3 AS (SELECT e.user_id AS k, min(e.ts) AS t FROM events e
      |  JOIN s2 ON e.user_id = s2.k AND e.ts > s2.t
      |  WHERE e.event_type = 'purchase' GROUP BY 1),
      |c AS (
      |  SELECT 1 AS stage_idx, 'view' AS stage,
      |    (SELECT count(*) FROM s1) AS n_keys
      |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
      |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
      |  CAST(n_keys AS BIGINT) AS n_keys,
      |  round(CASE WHEN prev IS NULL THEN CAST(1.0 AS DOUBLE)
      |    WHEN prev = 0 THEN CAST(0.0 AS DOUBLE)
      |    ELSE CAST(n_keys AS DOUBLE) / CAST(prev AS DOUBLE) END, 6)
      |    AS conv_from_prev,
      |  round(CASE WHEN first_n = 0 THEN CAST(0.0 AS DOUBLE)
      |    ELSE CAST(n_keys AS DOUBLE) / CAST(first_n AS DOUBLE) END, 6)
      |    AS conv_from_first
      |FROM (SELECT *, lag(n_keys) OVER (ORDER BY stage_idx) AS prev,
      |    first_value(n_keys) OVER (ORDER BY stage_idx) AS first_n
      |  FROM c)""".stripMargin

  // ------------------- weekly cohort retention (§2.10 ext)
  // Cohort = ISO week of the key's first event; retained at offset w on
  // any activity in cohort-week + w. Two key-partitioned aggregations
  // meet in a key join; the output is a cohorts×offsets cell table and
  // cohort sizes re-join broadcast.
  private[queries] def q192Retention(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.weeklyRetention(Tables.events(s, d),
      col("user_id"), col("ts"))

  private[queries] lazy val q192Sql =
    """WITH fw AS (SELECT user_id AS k,
      |    CAST(date_trunc('week', min(ts)) AS DATE) AS cw
      |  FROM events GROUP BY 1),
      |aw AS (SELECT DISTINCT user_id AS k,
      |    CAST(date_trunc('week', ts) AS DATE) AS aw FROM events),
      |cells AS (SELECT cw,
      |    CAST(date_diff('day', cw, aw) // 7 AS INTEGER) AS week_offset,
      |    CAST(count(*) AS BIGINT) AS n_active
      |  FROM aw JOIN fw USING (k) GROUP BY 1, 2),
      |sz AS (SELECT cw, n_active AS n_cohort FROM cells
      |  WHERE week_offset = 0)
      |SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week, week_offset,
      |  n_active,
      |  round(CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6)
      |    AS retention
      |FROM cells c JOIN sz ON c.cw = sz.cw""".stripMargin

  // ------------------- windowed funnel (§2.10 ext)
  // q191's funnel with the conversion window every product funnel
  // actually uses: stage i+1 counts only within maxGap of the stage-i
  // instant. Gap test is epoch-microsecond long arithmetic on both
  // engines. 24h at fixture event density: 150 -> 60 -> 25.
  private[queries] lazy val q196GapSeconds = 86400L

  private[queries] def q196FunnelWithin(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.funnelWithin(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_type"), q191Stages,
      q196GapSeconds)

  private[queries] lazy val q196Sql = {
    val g = q196GapSeconds * 1000000L
    s"""WITH s1 AS (SELECT user_id AS k, min(ts) AS t FROM events
       |  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1),
       |s2 AS (SELECT e.user_id AS k, min(e.ts) AS t FROM events e
       |  JOIN s1 ON e.user_id = s1.k AND e.ts > s1.t
       |    AND epoch_us(e.ts) <= epoch_us(s1.t) + $g
       |  WHERE e.event_type = 'click' GROUP BY 1),
       |s3 AS (SELECT e.user_id AS k, min(e.ts) AS t FROM events e
       |  JOIN s2 ON e.user_id = s2.k AND e.ts > s2.t
       |    AND epoch_us(e.ts) <= epoch_us(s2.t) + $g
       |  WHERE e.event_type = 'purchase' GROUP BY 1),
       |c AS (
       |  SELECT 1 AS stage_idx, 'view' AS stage,
       |    (SELECT count(*) FROM s1) AS n_keys
       |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
       |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
       |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
       |  CAST(n_keys AS BIGINT) AS n_keys,
       |  round(CASE WHEN prev IS NULL THEN CAST(1.0 AS DOUBLE)
       |    WHEN prev = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE CAST(n_keys AS DOUBLE) / CAST(prev AS DOUBLE) END, 6)
       |    AS conv_from_prev,
       |  round(CASE WHEN first_n = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE CAST(n_keys AS DOUBLE) / CAST(first_n AS DOUBLE) END, 6)
       |    AS conv_from_first
       |FROM (SELECT *, lag(n_keys) OVER (ORDER BY stage_idx) AS prev,
       |    first_value(n_keys) OVER (ORDER BY stage_idx) AS first_n
       |  FROM c)""".stripMargin
  }

  // ------------------- event transition matrix (§2.10 ext)
  // First-order Markov model of user journeys: per-key lag window over
  // one shuffle, types²-bounded counts, row-normalized probabilities.
  private[queries] def q202Transitions(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.transitionMatrix(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_id"), col("event_type"))

  private[queries] lazy val q202Sql =
    """WITH pairs AS (SELECT event_type AS to_type,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM events),
      |cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t
      |  FROM cnt GROUP BY 1)
      |SELECT from_type, to_type, n,
      |  round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS p
      |FROM cnt JOIN tot USING (from_type)""".stripMargin

  // ------------------- session summary (§2.10 ext)
  // The engagement dashboard's one-row rollup over q43's session table:
  // bounce share, mean events/session, mean duration. Composes the
  // registered sessionization; oracle composes q43's oracle.
  private[queries] def q208SessionSummary(s: SparkSession, d: String): DataFrame =
    graft.operators.Sessionize.sessionSummary(Tables.events(s, d),
      Seq("user_id"), col("ts").cast("timestamp"), col("event_id"),
      gapSeconds = 3600L)

  private[queries] lazy val q208Sql =
    s"""WITH sess AS ($q43Sql)
       |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bounce,
       |  round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS bounce_rate,
       |  round(CAST(sum(n_events) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS mean_events,
       |  round(CAST(sum(duration_s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS mean_duration_s
       |FROM sess""".stripMargin

  // ------------------- categorical balance, chi-square (§2.10 ext)
  // Stratification QA: per source, Pearson's chi² of its language
  // composition vs the corpus-wide one. Missing categories pay their
  // full expected mass; cell terms snap to 1e-6 into a decimal sum.
  private[queries] def q220CategoricalBalance(s: SparkSession, d: String)
      : DataFrame =
    graft.operators.Datasheet.categoricalBalance(Tables.documents(s, d),
      col("source"), col("lang"))

  private[queries] lazy val q220Sql =
    """WITH cnt AS (SELECT source AS src, lang AS cat,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
      |ctt AS (SELECT cat, CAST(sum(o) AS BIGINT) AS ct
      |  FROM cnt GROUP BY 1),
      |stt AS (SELECT src, CAST(sum(o) AS BIGINT) AS st
      |  FROM cnt GROUP BY 1),
      |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cnt),
      |grid AS (SELECT s.src, c.cat, s.st, c.ct,
      |    COALESCE(cnt.o, 0) AS o, nn.n
      |  FROM stt s CROSS JOIN ctt c
      |  LEFT JOIN cnt ON cnt.src = s.src AND cnt.cat = c.cat
      |  CROSS JOIN nn),
      |t AS (SELECT src, st, CAST(round(
      |    (CAST(o AS DOUBLE) - CAST(st AS DOUBLE) * CAST(ct AS DOUBLE)
      |       / CAST(n AS DOUBLE)) *
      |    (CAST(o AS DOUBLE) - CAST(st AS DOUBLE) * CAST(ct AS DOUBLE)
      |       / CAST(n AS DOUBLE)) /
      |    (CAST(st AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |    * 1e6) AS HUGEINT) AS t6
      |  FROM grid)
      |SELECT src, max(st) AS n_docs, CAST(count(*) AS BIGINT) AS n_cats,
      |  round(CAST(sum(t6) AS DOUBLE) / 1e6, 6) AS chi2
      |FROM t GROUP BY src""".stripMargin

  // ------------------- DAU / rolling WAU (§2.10 ext)
  // Exact distinct actives per day and per trailing 7-day window: the
  // corpus collapses to the (key, day) grain once; the rolling count
  // explodes that metadata to the windows each pair serves.
  private[queries] def q227ActiveUsers(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.activeUsers(Tables.events(s, d),
      col("user_id"), col("ts"), windowDays = 7)

  private[queries] lazy val q227Sql =
    """WITH ud AS (SELECT DISTINCT user_id AS k,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |dau AS (SELECT dd, CAST(count(*) AS BIGINT) AS dau
      |        FROM ud GROUP BY 1),
      |w AS (SELECT DISTINCT k, dd + t.x AS wd FROM ud CROSS JOIN
      |        (SELECT unnest(generate_series(0, 6)) AS x) t),
      |wau AS (SELECT wd, CAST(count(*) AS BIGINT) AS wau
      |        FROM w GROUP BY 1)
      |SELECT DATE '1970-01-01' + CAST(dd AS INTEGER) AS day,
      |  dau.dau, wau.wau
      |FROM dau JOIN wau ON wau.wd = dau.dd""".stripMargin

  // ------------------- event-volume anomaly panel (§2.10 ext)
  // Per-type daily counts vs the type's own history: spike when
  // |n - mean| > z·σ, stats from exact decimal sums over the
  // types×days count table.
  private[queries] lazy val q229Z = 2.0

  private[queries] def q229VolumeAnomaly(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.volumeAnomaly(Tables.events(s, d),
      col("event_type"), col("ts"), q229Z)

  private[queries] lazy val q229Sql =
    s"""WITH cnt AS (SELECT event_type AS t,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
       |  GROUP BY 1, 2),
       |st AS (SELECT t, CAST(count(*) AS BIGINT) AS d,
       |    CAST(sum(CAST(n AS HUGEINT)) AS HUGEINT) AS s1,
       |    CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2
       |  FROM cnt GROUP BY 1),
       |x AS (SELECT cnt.t, cnt.dd, cnt.n, st.d,
       |    (CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE)) /
       |      CAST(greatest(d - 1, 1) AS DOUBLE) AS mean,
       |    sqrt(greatest((CAST(s2 AS DOUBLE) -
       |        CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) /
       |        CAST(greatest(d - 1, 1) AS DOUBLE) -
       |      ((CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE)) /
       |        CAST(greatest(d - 1, 1) AS DOUBLE)) *
       |      ((CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE)) /
       |        CAST(greatest(d - 1, 1) AS DOUBLE)), 0.0)) AS sd,
       |    (CAST(d - 1 AS HUGEINT) *
       |       (s2 - CAST(n AS HUGEINT) * n) =
       |     (s1 - n) * (s1 - n)) AS is_const
       |  FROM cnt JOIN st USING (t))
       |SELECT t AS event_type,
       |  DATE '1970-01-01' + CAST(dd AS INTEGER) AS day, n,
       |  CASE WHEN d = 1 OR is_const OR sd = 0.0 THEN NULL
       |    ELSE round((CAST(n AS DOUBLE) - mean) / sd, 4) END AS dev,
       |  CASE WHEN d = 1 THEN FALSE
       |    WHEN is_const OR sd = 0.0
       |      THEN abs(CAST(n AS DOUBLE) - mean) > 0.0
       |    ELSE abs(CAST(n AS DOUBLE) - mean) > sd * $q229Z END
       |    AS is_spike
       |FROM x""".stripMargin

  // ------------------- session association rules (§2.10 ext)
  // Market-basket on the session grain: support / confidence / lift per
  // ordered event-type pair — the empirical check on a funnel's assumed
  // stage order. One session window, then types²-bounded rule rows.
  private[queries] def q231AssociationRules(s: SparkSession, d: String)
      : DataFrame =
    graft.operators.Sessionize.associationRules(Tables.events(s, d),
      Seq("user_id"), col("ts").cast("timestamp"), col("event_id"),
      col("event_type"), gapSeconds = 3600L)

  private[queries] lazy val q231Sql =
    """WITH b AS (SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_ms(ts) // 1000 -
      |            epoch_ms(lag(ts) OVER w) // 1000 > 3600
      |         THEN 1 ELSE 0 END AS nb
      |  FROM events WHERE user_id IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, event_type,
      |    CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sidx
      |  FROM b),
      |items AS (SELECT DISTINCT user_id, sidx, event_type AS t
      |  FROM s WHERE event_type IS NOT NULL),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS s FROM
      |  (SELECT DISTINCT user_id, sidx FROM items)),
      |singles AS (SELECT t, CAST(count(*) AS BIGINT) AS n1
      |  FROM items GROUP BY 1),
      |pairs AS (SELECT a.t AS ta, b2.t AS tb,
      |    CAST(count(*) AS BIGINT) AS n_both
      |  FROM items a JOIN items b2
      |    ON a.user_id = b2.user_id AND a.sidx = b2.sidx AND a.t < b2.t
      |  GROUP BY 1, 2),
      |r AS (SELECT ta AS lhs, tb AS rhs, n_both FROM pairs
      |      UNION ALL SELECT tb, ta, n_both FROM pairs)
      |SELECT lhs, rhs, n_both,
      |  round(CAST(n_both AS DOUBLE) / CAST(tot.s AS DOUBLE), 6)
      |    AS support,
      |  round(CAST(n_both AS DOUBLE) / CAST(nl.n1 AS DOUBLE), 6)
      |    AS confidence,
      |  round((CAST(n_both AS DOUBLE) * CAST(tot.s AS DOUBLE)) /
      |    (CAST(nl.n1 AS DOUBLE) * CAST(nr.n1 AS DOUBLE)), 6) AS lift
      |FROM r JOIN singles nl ON r.lhs = nl.t
      |  JOIN singles nr ON r.rhs = nr.t CROSS JOIN tot""".stripMargin

  // ------------------- inter-arrival cadence panel (§2.10 ext)
  // Per event type, exact median/p90 of same-user consecutive-event
  // gaps (attributed to the later event's type): the measured number a
  // session gap or poll budget is tuned against. Frequency-weighted
  // exact percentiles over the (type, gap) count table.
  private[queries] def q232InterArrival(s: SparkSession, d: String): DataFrame =
    graft.operators.Sessionize.interArrival(Tables.events(s, d),
      Seq("user_id"), col("ts").cast("timestamp"), col("event_id"),
      col("event_type"))

  private[queries] lazy val q232Sql =
    """WITH g AS (SELECT event_type AS t,
      |    CAST(epoch_ms(ts) // 1000 - epoch_ms(lag(ts) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id)) // 1000
      |      AS DOUBLE) AS gap
      |  FROM events WHERE user_id IS NOT NULL),
      |f AS (SELECT t, gap FROM g
      |      WHERE t IS NOT NULL AND gap IS NOT NULL)
      |SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap), 6)
      |    AS median_gap_s,
      |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap), 6)
      |    AS p90_gap_s
      |FROM f GROUP BY 1""".stripMargin

  // ------------------- A/B two-proportion z-test (§2.10 ext)
  // Hash-split buckets (portable mixedHash mod 2 — the oracle replays
  // every assignment), conversion = key purchased at least once,
  // pooled-SE z. One key-grain aggregate, metadata finish.
  private[queries] def q236AbTest(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.abTest(Tables.events(s, d), col("user_id"),
      col("event_type"), "purchase")

  private[queries] lazy val q23xUserPoly = "list_reduce(list_transform(" +
    "string_split(CAST(k AS VARCHAR), ''), " +
    "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"

  private[queries] lazy val q236Sql =
    s"""WITH pk AS (SELECT user_id AS k,
       |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS conv
       |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
       |bk AS (SELECT (((($q23xUserPoly * 1103515245 + 12345) %
       |    1000000007) * 2654435761) % 1000000007) % 2 AS b, conv
       |  FROM pk),
       |a AS (SELECT
       |    CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN b = 0 THEN conv ELSE 0 END) AS BIGINT)
       |      AS conv_a,
       |    CAST(sum(CASE WHEN b = 1 THEN conv ELSE 0 END) AS BIGINT)
       |      AS conv_b
       |  FROM bk),
       |x AS (SELECT n_a, n_b, conv_a, conv_b,
       |    CAST(conv_a AS DOUBLE) /
       |      CAST(greatest(n_a, 1) AS DOUBLE) AS pa,
       |    CAST(conv_b AS DOUBLE) /
       |      CAST(greatest(n_b, 1) AS DOUBLE) AS pb,
       |    CAST(conv_a + conv_b AS DOUBLE) /
       |      CAST(greatest(n_a + n_b, 1) AS DOUBLE) AS pool
       |  FROM a),
       |y AS (SELECT *, sqrt(pool * (1.0 - pool) *
       |    (1.0 / CAST(greatest(n_a, 1) AS DOUBLE) +
       |     1.0 / CAST(greatest(n_b, 1) AS DOUBLE))) AS se
       |  FROM x)
       |SELECT n_a, n_b, conv_a, conv_b,
       |  CASE WHEN n_a = 0 THEN NULL ELSE round(pa, 6) END AS rate_a,
       |  CASE WHEN n_b = 0 THEN NULL ELSE round(pb, 6) END AS rate_b,
       |  CASE WHEN n_a = 0 OR n_b = 0 OR pool = 0.0 OR pool = 1.0
       |    THEN NULL ELSE round((pa - pb) / se, 4) END AS z,
       |  CASE WHEN n_a = 0 OR n_b = 0 OR pool = 0.0 OR pool = 1.0
       |    THEN FALSE ELSE abs((pa - pb) / se) > 1.96 END AS significant
       |FROM y""".stripMargin

  // ------------------- A/B split funnel (§2.10 ext)
  // The funnel per experiment bucket (same hash assignment as q236):
  // which STAGE the experiment moved. Two scan-pushed funnel passes.
  private[queries] def q237SplitFunnel(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.funnelBySplit(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_type"), q191Stages)

  private[queries] lazy val q237Sql = {
    val bExpr = s"(((($q23xUserPoly * 1103515245 + 12345) % " +
      "1000000007) * 2654435761) % 1000000007) % 2"
    val perBucket = (0 to 1).map { b =>
      s"""e$b AS (SELECT user_id AS k, ts, event_type FROM events
         |  WHERE user_id IS NOT NULL AND $bExpr = $b),
         |s1_$b AS (SELECT k, min(ts) AS t FROM e$b
         |  WHERE event_type = 'view' GROUP BY 1),
         |s2_$b AS (SELECT e.k, min(e.ts) AS t FROM e$b e
         |  JOIN s1_$b s ON e.k = s.k AND e.ts > s.t
         |  WHERE e.event_type = 'click' GROUP BY 1),
         |s3_$b AS (SELECT e.k, min(e.ts) AS t FROM e$b e
         |  JOIN s2_$b s ON e.k = s.k AND e.ts > s.t
         |  WHERE e.event_type = 'purchase' GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val rows = (0 to 1).flatMap { b =>
      Seq(s"SELECT $b AS bucket, 1 AS stage_idx, 'view' AS stage, " +
        s"(SELECT count(*) FROM s1_$b) AS n_keys",
        s"SELECT $b, 2, 'click', (SELECT count(*) FROM s2_$b)",
        s"SELECT $b, 3, 'purchase', (SELECT count(*) FROM s3_$b)")
    }.mkString(" UNION ALL ")
    s"""WITH $perBucket,
       |c AS ($rows)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST(stage_idx AS INTEGER) AS stage_idx, stage,
       |  CAST(n_keys AS BIGINT) AS n_keys,
       |  round(CASE WHEN prev IS NULL THEN CAST(1.0 AS DOUBLE)
       |    WHEN prev = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE CAST(n_keys AS DOUBLE) / CAST(prev AS DOUBLE) END, 6)
       |    AS conv_from_prev,
       |  round(CASE WHEN first_n = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE CAST(n_keys AS DOUBLE) / CAST(first_n AS DOUBLE) END, 6)
       |    AS conv_from_first
       |FROM (SELECT *,
       |    lag(n_keys) OVER (PARTITION BY bucket ORDER BY stage_idx)
       |      AS prev,
       |    first_value(n_keys) OVER (PARTITION BY bucket
       |      ORDER BY stage_idx) AS first_n
       |  FROM c)""".stripMargin
  }

  // ------------------- grouped jackknife (§2.10 ext)
  // Delete-one-SOURCE jackknife for the corpus mean-tokens-per-doc
  // ratio: the uncertainty number row-level i.i.d. SEs fake (documents
  // within a source are correlated). q234 = one-row summary with the
  // normal-approx CI; q235 = the per-source influence ranking.
  private[queries] def q234JackknifeSummary(s: SparkSession, d: String)
      : DataFrame =
    graft.operators.Trend.jackknifeSummary(Tables.documents(s, d),
      col("source"), graft.functions.TextExprs.tokenCount(col("text")),
      lit(1L))

  private[queries] def q235JackknifePanel(s: SparkSession, d: String): DataFrame =
    graft.operators.Trend.jackknifePanel(Tables.documents(s, d),
      col("source"), graft.functions.TextExprs.tokenCount(col("text")),
      lit(1L))

  private[queries] lazy val q23xJackCtes =
    """WITH base AS (SELECT source AS grp,
      |    CAST(round(CAST(
      |      CASE WHEN length(trim(text)) = 0 THEN 0
      |           ELSE len(regexp_split_to_array(trim(text), '\s+')) END
      |      AS DOUBLE) * 1e6) AS BIGINT) AS n6,
      |    CAST(round(CAST(1 AS DOUBLE) * 1e6) AS BIGINT) AS d6
      |  FROM documents WHERE source IS NOT NULL),
      |sums AS (SELECT grp, CAST(sum(CAST(n6 AS HUGEINT)) AS HUGEINT)
      |    AS n_g,
      |    CAST(sum(CAST(d6 AS HUGEINT)) AS HUGEINT) AS d_g
      |  FROM base GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS g,
      |    CAST(sum(n_g) AS HUGEINT) AS tn,
      |    CAST(sum(d_g) AS HUGEINT) AS td FROM sums),
      |lo AS (SELECT grp, g, tn, td,
      |    CASE WHEN CAST(td - d_g AS DOUBLE) = 0.0 THEN NULL
      |      ELSE CAST(tn - n_g AS DOUBLE) / CAST(td - d_g AS DOUBLE)
      |    END AS th_loo
      |  FROM sums CROSS JOIN tot)""".stripMargin

  private[queries] lazy val q234Sql =
    s"""$q23xJackCtes,
       |live AS (SELECT tn, td,
       |    CAST(round(th_loo * 1e9) AS BIGINT) AS t9
       |  FROM lo WHERE th_loo IS NOT NULL),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS g2, max(tn) AS tn,
       |    max(td) AS td,
       |    CAST(sum(CAST(t9 AS HUGEINT)) AS HUGEINT) AS s9 FROM live),
       |w AS (SELECT a.g2, a.tn, a.td, a.s9, live.t9
       |      FROM a CROSS JOIN live),
       |t AS (SELECT g2, tn, td, s9, CAST(round(
       |    (CAST(t9 AS DOUBLE) / 1e9 -
       |      CAST(s9 AS DOUBLE) / 1e9 / CAST(g2 AS DOUBLE)) *
       |    (CAST(t9 AS DOUBLE) / 1e9 -
       |      CAST(s9 AS DOUBLE) / 1e9 / CAST(g2 AS DOUBLE)) * 1e12)
       |    AS BIGINT) AS t12
       |  FROM w),
       |f AS (SELECT g2, tn, td, s9,
       |    CAST(sum(CAST(t12 AS HUGEINT)) AS HUGEINT) AS ss
       |  FROM t GROUP BY 1, 2, 3, 4)
       |SELECT g2 AS n_groups,
       |  round(CAST(tn AS DOUBLE) / CAST(td AS DOUBLE), 6) AS theta,
       |  round(CAST(s9 AS DOUBLE) / 1e9 / CAST(g2 AS DOUBLE), 6)
       |    AS jack_mean,
       |  round(sqrt((CAST(g2 AS DOUBLE) - 1.0) / CAST(g2 AS DOUBLE) *
       |    (CAST(ss AS DOUBLE) / 1e12)), 6) AS jack_se,
       |  round(CAST(tn AS DOUBLE) / CAST(td AS DOUBLE) -
       |    1.96 * sqrt((CAST(g2 AS DOUBLE) - 1.0) / CAST(g2 AS DOUBLE) *
       |      (CAST(ss AS DOUBLE) / 1e12)), 6) AS ci_lo,
       |  round(CAST(tn AS DOUBLE) / CAST(td AS DOUBLE) +
       |    1.96 * sqrt((CAST(g2 AS DOUBLE) - 1.0) / CAST(g2 AS DOUBLE) *
       |      (CAST(ss AS DOUBLE) / 1e12)), 6) AS ci_hi
       |FROM f""".stripMargin

  private[queries] lazy val q235Sql =
    s"""$q23xJackCtes
       |SELECT grp, round(th_loo, 6) AS theta_loo,
       |  round((CAST(g AS DOUBLE) - 1.0) *
       |    (CAST(tn AS DOUBLE) / CAST(td AS DOUBLE) - th_loo), 6)
       |    AS influence
       |FROM lo""".stripMargin

  // ------------------- source-affinity map (§2.10 ext)
  // Pairwise cosine between per-label embedding centroids: which feeds
  // are the same domain under two names. Snap-9 decimal component sums,
  // snap-6 fixed-point means, integer dot/norms — order-free end to
  // end; the corpus shuffle carries (label, dim) partials, no vectors.
  private[queries] def q216SourceAffinity(s: SparkSession, d: String): DataFrame =
    graft.operators.Datasheet.sourceAffinity(Tables.embeddings(s, d),
      col("embedding"), col("label"), dims = 64)

  private[queries] lazy val q216Sql =
    """WITH x AS (SELECT label AS src,
      |    generate_subscripts(embedding, 1) AS dim,
      |    unnest(CAST(embedding AS DOUBLE[])) AS v
      |  FROM embeddings),
      |a AS (SELECT src, dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(v * 1e9) AS HUGEINT)) AS HUGEINT) AS s9
      |  FROM x GROUP BY 1, 2),
      |cent AS (SELECT src, dim,
      |    CAST(round(CAST(s9 AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) * 1e6)
      |      AS BIGINT) AS m6
      |  FROM a),
      |norms AS (SELECT src,
      |    CAST(sum(CAST(m6 AS HUGEINT) * m6) AS HUGEINT) AS nn
      |  FROM cent GROUP BY 1),
      |dots AS (SELECT ca.src AS src_a, cb.src AS src_b,
      |    CAST(sum(CAST(ca.m6 AS HUGEINT) * cb.m6) AS HUGEINT) AS dt
      |  FROM cent ca JOIN cent cb USING (dim)
      |  WHERE ca.src < cb.src GROUP BY 1, 2)
      |SELECT CAST(src_a AS INTEGER) AS src_a,
      |  CAST(src_b AS INTEGER) AS src_b,
      |  CASE WHEN na.nn = 0 OR nb.nn = 0 THEN NULL
      |    ELSE round(CAST(dt AS DOUBLE) /
      |      (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))),
      |      6) END AS cos
      |FROM dots JOIN norms na ON dots.src_a = na.src
      |  JOIN norms nb ON dots.src_b = nb.src""".stripMargin

  // ------------------- grouped OLS trend fit (§2.10 ext)
  // Per-source chars-vs-tokens regression line from decimal-exact
  // sufficient statistics: one map-side scan, groups-sized aggregate,
  // fixed IEEE closed form over the exact sums on both engines.
  private[queries] def q200OlsTrend(s: SparkSession, d: String): DataFrame =
    graft.operators.Trend.olsByGroup(Tables.documents(s, d),
      col("source"), col("n_chars"),
      graft.functions.TextExprs.tokenCount(col("text")))

  /** The decimal-exact OLS oracle tail over a CTE chain whose last
    * relation is `base(grp, x, y)` — shared by every Trend.olsByGroup
    * composition so the IEEE formula text is identical everywhere. */
  private[queries] def olsSqlOver(baseCtes: String): String =
    s"""$baseCtes,
      |st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM base GROUP BY 1),
      |d AS (SELECT grp, n,
      |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
      |    CAST(sy AS DOUBLE) AS syd,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
      |  FROM st)
      |SELECT grp, n, round(sxd / nd, 6) AS mean_x,
      |  round(syd / nd, 6) AS mean_y,
      |  round(CASE WHEN denx = 0 THEN NULL ELSE num / denx END, 6)
      |    AS slope,
      |  round((syd - CASE WHEN denx = 0 THEN NULL ELSE num / denx END
      |    * sxd) / nd, 6) AS intercept,
      |  round(CASE WHEN denx = 0 OR deny = 0 THEN NULL
      |    ELSE (num * num) / (denx * deny) END, 6) AS r2
      |FROM d""".stripMargin

  private[queries] lazy val q200Sql = olsSqlOver(
    """WITH base AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS x,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END
      |      AS BIGINT) AS y
      |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL)"""
      .stripMargin)

  // ------------------- last-touch attribution (§2.10 ext)
  // Each purchase credits the user's most recent view/click at-or-before
  // it (falling to 'unattributed' beyond the lookback) — composition
  // over the registered as-of join; values snap to cents before the
  // channel sum (dsum discipline). Oracle uses DuckDB's native ASOF
  // LEFT JOIN on touches deduped per (user, instant) with an explicit
  // max_by(event_id) winner, so the tie order matches by construction.
  private[queries] lazy val q197LookbackSeconds = 7200L

  private[queries] def q197Attribution(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.lastTouchAttribution(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_type"), col("event_id"),
      col("value"), "purchase", Seq("view", "click"),
      q197LookbackSeconds)

  private[queries] lazy val q197Sql = {
    val l = q197LookbackSeconds * 1000000L
    s"""WITH conv AS (SELECT user_id AS k, ts AS cts,
       |    CAST(round(value * 100) AS BIGINT) AS vc
       |  FROM events WHERE event_type = 'purchase'),
       |t0 AS (SELECT user_id AS k, ts AS tts,
       |    max_by(event_type, event_id) AS ch
       |  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1, 2),
       |a AS (SELECT conv.k, cts, vc, tts, ch FROM conv
       |  ASOF LEFT JOIN t0 ON conv.k = t0.k AND t0.tts <= conv.cts)
       |SELECT CASE WHEN tts IS NULL
       |    OR epoch_us(cts) - epoch_us(tts) > $l
       |    THEN 'unattributed' ELSE ch END AS channel,
       |  CAST(count(*) AS BIGINT) AS n_conversions,
       |  round(CAST(sum(vc) AS DOUBLE) / 100.0, 2) AS attributed_value
       |FROM a GROUP BY 1""".stripMargin
  }
}
