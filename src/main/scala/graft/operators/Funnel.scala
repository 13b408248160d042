package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion and cohort retention — the two standard
  * event-analytics rollups over a keyed event stream.
  *
  * Both are built as chains of key-partitioned aggregations and
  * key-equi-joins: every shuffle is on the entity key, each funnel stage
  * shrinks the keyed set (converted users only), and the final outputs
  * are stage- or cohort-cardinality tables. No windows, no self-joins of
  * the full stream, nothing driver-side. At 100 TB the dominant cost is
  * one hash-partition pass of the filtered stream per stage — and stage
  * filters push down to the scan, so each pass reads only its stage's
  * rows.
  */
object Funnel {

  /** Strict-order funnel: a key converts to stage i+1 only with an event
    * of that stage STRICTLY AFTER its stage-i conversion time (earliest
    * such event). Returns one row per stage: entered keys, conversion
    * rate vs the previous stage and vs stage 1.
    *
    * `stages` are matched against `typ`; rates are plain count ratios
    * (IEEE division of exact longs — deterministic cross-engine).
    * Null-key events are excluded (see [[stageReached]]) — identical to
    * the streaming arm, so their shared oracle holds with null keys.
    */
  def funnel(events: DataFrame, key: Column, ts: Column, typ: Column,
             stages: Seq[String]): DataFrame =
    funnelImpl(events, key, ts, typ, stages, None)

  /** [[funnel]] with a CONVERSION WINDOW: stage i+1 counts only events in
    * `(t_i, t_i + maxGapSeconds]` — the "converted within an hour" form
    * every product funnel actually uses (an unbounded funnel credits a
    * purchase months after the click). Same plan shape; the gap bound is
    * one more row-level join predicate on the already-keyed join.
    */
  def funnelWithin(events: DataFrame, key: Column, ts: Column, typ: Column,
                   stages: Seq[String], maxGapSeconds: Long): DataFrame = {
    require(maxGapSeconds >= 1,
      s"maxGapSeconds must be >= 1, got $maxGapSeconds")
    funnelImpl(events, key, ts, typ, stages, Some(maxGapSeconds))
  }

  /** [[funnel]] per hash-split experiment bucket — the A/B view of the
    * conversion funnel (which STAGE an experiment moved, not just the
    * end rate [[abTest]] reports). Buckets from the portable
    * `mixedHash(key) mod 2` — identical assignment to [[abTest]], so
    * the two panels describe the same experiment. Output = the funnel
    * rows with a leading `bucket` column.
    *
    * Scale: two filtered funnel passes — each stage filter pushes to
    * the scan, so total scanned volume equals one unsplit funnel's. */
  def funnelBySplit(events: DataFrame, key: Column, ts: Column,
                    typ: Column, stages: Seq[String]): DataFrame = {
    val b = pmod(Sketch.mixedHash(key.cast("string")), lit(2L))
    val withB = events.withColumn("__bucket", b)
    (0 to 1).map { i =>
      funnel(withB.filter(col("__bucket") === i.toLong), key, ts, typ,
        stages)
        .select(lit(i.toLong).as("bucket"), col("*"))
    }.reduce(_ unionByName _)
  }

  private def funnelImpl(events: DataFrame, key: Column, ts: Column,
                         typ: Column, stages: Seq[String],
                         maxGapSeconds: Option[Long]): DataFrame = {
    val counts = stageReached(events, key, ts, typ, stages, maxGapSeconds)
    val perStage = counts.zipWithIndex.map { case ((st, df), i) =>
      df.agg(count(lit(1)).as("n")).select(lit(i + 1).as("stage_idx"),
        lit(st).as("stage"), col("n").cast("long").as("n_keys"))
    }.reduce(_.union(_))
    funnelFinish(perStage)
  }

  /** The funnel's per-stage reach cascade: for each stage, the keys that
    * converted to it with their EARLIEST qualifying conversion time
    * (`(k, t)` per stage). Shared with the streaming arm, whose per-key
    * state is exactly this cascade folded wide.
    *
    * NULL keys are excluded at stage 1 — a null key is not an entity, it
    * can never convert past stage 1 anyway (the stage joins are
    * null-unsafe), and the streaming arm's per-key state cannot carry a
    * null row (it would miss every semi/anti probe and duplicate on each
    * re-derivation). Dropping it here keeps batch ≡ stream EXACT for
    * corpora with null keys; registered oracles filter the key
    * null-explicitly to pin the contract. */
  private[graft] def stageReached(events: DataFrame, key: Column,
      ts: Column, typ: Column, stages: Seq[String],
      maxGapSeconds: Option[Long]): Vector[(String, DataFrame)] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // stage 1: earliest qualifying event per non-null key
    var reached = events.where(typ === stages.head && key.isNotNull)
      .groupBy(key.as("k")).agg(min(ts).as("t"))
    var counts = Vector(stages.head -> reached)
    stages.tail.foreach { st =>
      // microsecond-exact gap bound (epoch-us longs on both engines)
      val inWindow = maxGapSeconds.map(g =>
        unix_micros(ts) <= unix_micros(col("t")) + g * 1000000L)
        .getOrElse(lit(true))
      val nxt = events.where(typ === st)
        .join(reached, key === col("k") && ts > col("t") && inWindow,
          "inner")
        .groupBy(col("k")).agg(min(ts).as("t2"))
        .select(col("k"), col("t2").as("t"))
      reached = nxt
      counts :+= (st -> nxt)
    }
    counts
  }

  /** Rate finish over a `(stage_idx, stage, n_keys)` table — stage-
    * cardinality broadcast scalars; the streaming arm reads the same
    * finish over counts derived from its state. */
  private[graft] def funnelFinish(perStage: DataFrame): DataFrame = {
    val spark = perStage.sparkSession
    import spark.implicits._
    val first = perStage.where($"stage_idx" === 1)
      .select($"n_keys".as("n_first"))
    val withPrev = perStage
      .join(broadcast(perStage.select(($"stage_idx" + 1).as("stage_idx"),
        $"n_keys".as("n_prev"))), Seq("stage_idx"), "left")
      .crossJoin(broadcast(first))
    withPrev.select($"stage_idx".cast("int").as("stage_idx"), $"stage",
      $"n_keys",
      round(when($"n_prev".isNull, lit(1.0))
        .when($"n_prev" === 0, lit(0.0))
        .otherwise($"n_keys".cast("double") / $"n_prev".cast("double")), 6)
        .as("conv_from_prev"),
      round(when($"n_first" === 0, lit(0.0))
        .otherwise($"n_keys".cast("double") / $"n_first".cast("double")), 6)
        .as("conv_from_first"))
  }

  /** Weekly cohort retention: cohort = ISO week of the key's first event;
    * a key is retained at offset w if it has any event in cohort-week+w.
    * Output is (cohort_week, week_offset, n_active, retention-vs-cohort-
    * size) — a cohorts×offsets-cardinality table.
    *
    * Two key-partitioned aggregations (first-event, active-weeks) meet in
    * a key-equi-join, then roll up to cohort cells; cohort sizes re-join
    * broadcast (cohort-cardinality table).
    */
  def weeklyRetention(events: DataFrame, key: Column, ts: Column): DataFrame = {
    val week = date_trunc("week", ts).cast("date")
    val firstWeek = events.groupBy(key.as("k"))
      .agg(min(ts).as("t0"))
      .select(col("k"), date_trunc("week", col("t0")).cast("date").as("cw"))
    val activeWeeks = events.select(key.as("k"), week.as("aw")).distinct()
    retentionFinish(firstWeek, activeWeeks)
  }

  /** The retention rollup over the two sufficient statistics — per-key
    * cohort week `(k, cw)` and distinct activity weeks `(k, aw)`.
    * Shared with the streaming arm, whose state is exactly these two
    * tables accumulated (min-merged / distinct-appended). */
  private[graft] def retentionFinish(firstWeek: DataFrame,
                                     activeWeeks: DataFrame): DataFrame = {
    val spark = firstWeek.sparkSession
    import spark.implicits._
    val cells = activeWeeks.join(firstWeek, Seq("k"))
      .groupBy($"cw", (datediff($"aw", $"cw") / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).cast("long").as("n_active"))
    val sizes = cells.where($"week_offset" === 0)
      .select($"cw", $"n_active".as("n_cohort"))
    cells.join(broadcast(sizes), Seq("cw"))
      .select(date_format($"cw", "yyyy-MM-dd").as("cohort_week"),
        $"week_offset", $"n_active",
        round($"n_active".cast("double") / $"n_cohort".cast("double"), 6)
          .as("retention"))
  }

  /** Per-key event transition matrix — the first-order Markov model of
    * user journeys: order each key's events by `(ts, tieBreak)`, count
    * each `(from_type → to_type)` adjacency, and row-normalize into
    * transition probabilities. Output: `(from_type, to_type, n, p)` —
    * a types²-cardinality table.
    *
    * One key-partitioned window (lag) over one shuffle of the event
    * stream, then a types²-bounded count aggregate; row totals re-derive
    * from the count table (never a second corpus pass) and join back on
    * the types-sized key. `p` is one IEEE division of exact longs,
    * snapped to 6 decimals.
    */
  def transitionMatrix(events: DataFrame, key: Column, ts: Column,
                       tieBreak: Column, typ: Column): DataFrame =
    transitionsFromCounts(transitionCounts(events, key, ts, tieBreak, typ))

  /** [[transitionMatrix]]'s sufficient statistic: the types²-bounded
    * `(from_type, to_type, n)` adjacency count table. ADDITIVE across
    * disjoint event sets only when per-key boundary adjacencies are
    * stitched — which is exactly what the streaming arm's last-event
    * state exists for. */
  def transitionCounts(events: DataFrame, key: Column, ts: Column,
                       tieBreak: Column, typ: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(ts.asc, tieBreak.asc)
    events
      .select(typ.as("to_type"), lag(typ, 1).over(w).as("from_type"))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** [[transitionMatrix]] over a pre-aggregated `(from_type, to_type,
    * n)` count table (the streaming state's grain). */
  def transitionsFromCounts(cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("t"))
    cnt.join(broadcast(tot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("t").cast("double"), 6)
          .as("p"))
  }

  /** Last-touch attribution: each conversion event credits the key's most
    * recent touch event at-or-before it (`ts_touch ≤ ts_conv`), falling to
    * `"unattributed"` when no touch exists or the latest one is older than
    * `lookbackSeconds`. Output: one row per channel —
    * `(channel, n_conversions, attributed_value)`.
    *
    * Built as a composition over [[AsOfJoin.asofJoin]] (the single-shuffle
    * union+sort+merge — per-key cost linear, never the quadratic
    * equi-join+filter), after collapsing touches to one per (key, instant)
    * with a deterministic `max_by(channel, eventId)` winner so the as-of
    * tie-break is explicit on both engines. Conversion values snap to
    * 1e-2 fixed-point longs BEFORE the channel sum (order-free exactness —
    * the dsum discipline), one division at channel grain. The rollup is a
    * channels-cardinality aggregate; the lookback test is epoch-microsecond
    * long arithmetic.
    */
  def lastTouchAttribution(events: DataFrame, key: Column, ts: Column,
                           typ: Column, eventId: Column, value: Column,
                           conversionType: String, touchTypes: Seq[String],
                           lookbackSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(lookbackSeconds >= 1,
      s"lookbackSeconds must be >= 1, got $lookbackSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    val conv = events.where(typ === conversionType)
      .select(key.as("k"), ts.as("cts"),
        round(value * 100).cast("long").as("vc"))
    val touches = events.where(typ.isin(touchTypes.map(lit(_)): _*))
      .groupBy(key.as("k"), ts.as("tts"))
      .agg(max_by(typ, eventId).as("channel"))
    attributionFinish(assignLastTouch(conv, touches, lookbackSeconds)
      .groupBy($"channel")
      .agg(count(lit(1)).as("n"), sum($"vc").as("s")))
  }

  /** Per-conversion channel assignment — the as-of core of
    * [[lastTouchAttribution]], shared with the streaming arm (whose
    * per-poll verdicts are FINAL under ts-monotone arrival and fold
    * additively). `conv` is `(k, cts, vc)` with `vc` the cents-snapped
    * value; `touches` is `(k, tts, channel)` already collapsed to one
    * winner per (key, instant). Returns one `(channel, vc)` row per
    * conversion. */
  private[graft] def assignLastTouch(conv: DataFrame, touches: DataFrame,
                                     lookbackSeconds: Long): DataFrame = {
    val spark = conv.sparkSession
    import spark.implicits._
    val joined = AsOfJoin.asofJoin(conv, touches, Seq("k"), "cts", "tts")
    val tooOld = unix_micros($"cts") - unix_micros($"asof_tts") >
      lookbackSeconds * 1000000L
    joined.select(when($"asof_tts".isNull || tooOld, lit("unattributed"))
      .otherwise($"asof_channel").as("channel"), $"vc")
  }

  /** Channel rollup finish over an additive `(channel, n, s)` partial
    * table (`s` = cents sum): exact long sums, one snapped division at
    * channel grain — identical whether the partials come from one batch
    * or from a stream's accumulated state. */
  private[graft] def attributionFinish(partials: DataFrame): DataFrame =
    partials.groupBy(col("channel"))
      .agg(sum(col("n")).cast("long").as("n_conversions"),
        round(sum(col("s")).cast("double") / 100.0, 2)
          .as("attributed_value"))

  /** Daily + rolling-window active users — the DAU/WAU pair on every
    * engagement dashboard: per calendar day, EXACT distinct keys active
    * that day and exact distinct keys active in the trailing
    * `windowDays` window ending that day. Rolling distinct is NOT a sum
    * of dailies (a key active twice in a window counts once), which is
    * why the naive "sum the DAU" chart overstates WAU.
    *
    * Scale shape: the corpus collapses FIRST to the distinct
    * (key, day) grain — the only corpus-sized shuffle; dailies are one
    * count over it, and the rolling count explodes each (key, day) to
    * the `windowDays` windows it can serve (keys × days × window
    * metadata, integer epoch-day arithmetic) before a distinct count
    * per window end. Days with no events emit no row (there is no
    * zero-filled calendar — joins stay data-sized). */
  def activeUsers(events: DataFrame, key: Column, ts: Column,
                  windowDays: Int): DataFrame =
    activeUsersFromGrain(activeGrain(events, key, ts), windowDays)

  /** [[activeUsers]]' sufficient statistic: the distinct `(k, dd)`
    * key-day grain. Distinct sets MERGE by union-distinct (idempotent),
    * so per-batch grains fold exactly under any arrival split — the
    * streaming arm's state (`streaming/ActiveStream`). */
  def activeGrain(events: DataFrame, key: Column, ts: Column)
      : DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    events
      .select(key.as("k"), datediff(to_date(ts), epoch).as("dd"))
      .filter(col("k").isNotNull && col("dd").isNotNull)
      .distinct()
  }

  /** [[activeUsers]] over a pre-built distinct `(k, dd)` grain. */
  def activeUsersFromGrain(ud: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val epoch = to_date(lit("1970-01-01"))
    val dau = ud.groupBy(col("dd")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("k"), explode(sequence(col("dd").cast("long"),
        col("dd").cast("long") + (windowDays - 1))).as("wd"))
      .distinct()
      .groupBy(col("wd")).agg(count(lit(1)).as("wau"))
    dau.join(wau, dau("dd").cast("long") === wau("wd"))
      .select(date_add(epoch, col("dd").cast("int")).as("day"),
        col("dau"), col("wau"))
  }

  /** Two-proportion z-test between hash-split user buckets — the A/B
    * experimentation staple, run the way a data engine should: buckets
    * from the PORTABLE `mixedHash(key) mod 2` (no RNG — the assignment
    * replays anywhere, the [[graft.operators.Mix]] discipline),
    * conversion = the key emitted `convertType` at least once, pooled
    * standard error `√(p̂(1−p̂)(1/n₁+1/n₂))`, z = (p₁−p₂)/se. One row:
    * `(n_a, n_b, conv_a, conv_b, rate_a, rate_b, z, significant)` —
    * `z` null (and significant false) when the pooled rate is 0 or 1
    * (no variance: identical all-or-nothing behavior in both buckets).
    *
    * Scale shape: one key-grain aggregate (max-of-indicator per key —
    * the only corpus-sized shuffle) folding into a 2-row bucket table
    * and one metadata row; exact long counts, a fixed IEEE finish
    * snapped to 6 (z to 4). */
  def abTest(events: DataFrame, key: Column, typ: Column,
             convertType: String, zCrit: Double = 1.96): DataFrame =
    abTestFromKeyConv(abKeyConv(events, key, typ, convertType), zCrit)

  /** [[abTest]]'s sufficient statistic: the per-key `(k, conv)`
    * converted-ever indicator — max-MERGEABLE (idempotent: duplicate
    * deliveries and any arrival split fold to the same state), the
    * streaming arm's grain (`streaming/AbTestStream`). */
  def abKeyConv(events: DataFrame, key: Column, typ: Column,
                convertType: String): DataFrame =
    events
      .select(key.as("k"), (typ === convertType).cast("long").as("c"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(max(col("c")).as("conv"))

  /** [[abTest]] over a pre-built per-key `(k, conv)` table; the bucket
    * derives from the key at finish time (a pure hash function — no
    * bucket column needs storing). */
  def abTestFromKeyConv(perKeyConv: DataFrame, zCrit: Double)
      : DataFrame = {
    require(zCrit > 0, s"zCrit must be positive, got $zCrit")
    val perKey = perKeyConv
      .select(pmod(Sketch.mixedHash(col("k").cast("string")), lit(2L))
        .as("b"), col("conv"))
    // sum() over ZERO rows is null — coalesce to 0 so an empty corpus
    // takes the documented degenerate branch (null z, significant =
    // false) instead of null-skipping every when() below
    val agg = perKey.agg(
        sum(when(col("b") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("b") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("b") === 0L, col("conv")).otherwise(0L))
          .as("conv_a"),
        sum(when(col("b") === 1L, col("conv")).otherwise(0L))
          .as("conv_b"))
      .select(coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("conv_a"), lit(0L)).as("conv_a"),
        coalesce(col("conv_b"), lit(0L)).as("conv_b"))
    // ANSI-safe: clamp the bucket sizes inside the divisions; an empty
    // bucket's outputs are forced null/false below before these leak
    val nA = greatest(col("n_a"), lit(1L)).cast("double")
    val nB = greatest(col("n_b"), lit(1L)).cast("double")
    val pA = col("conv_a").cast("double") / nA
    val pB = col("conv_b").cast("double") / nB
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      greatest(col("n_a") + col("n_b"), lit(1L)).cast("double")
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / nA + lit(1.0) / nB))
    val z = (pA - pB) / se
    val degenerate = col("n_a") === 0L || col("n_b") === 0L ||
      pool === 0.0 || pool === 1.0
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      when(col("n_a") === 0L, lit(null).cast("double"))
        .otherwise(round(pA, 6)).as("rate_a"),
      when(col("n_b") === 0L, lit(null).cast("double"))
        .otherwise(round(pB, 6)).as("rate_b"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(z, 4)).as("z"),
      when(degenerate, lit(false))
        .otherwise(abs(z) > zCrit).as("significant"))
  }

  /** Per-type event-volume anomaly panel — the ingest monitor that
    * catches a feed spike/outage BEFORE a mixture inherits it: per
    * (event type, day), the day's count against the type's own daily
    * history with the tested day LEFT OUT of its own baseline. The
    * leave-in z-score caps `|dev|` at `√(d−1)` over `d` days (the
    * tested point drags its own mean and σ), so with z = 2 a type with
    * ≤ 4 days of history could mathematically never flag — exactly the
    * early-history window where new feeds break; leave-one-out keeps a
    * 3-day-old feed's outage flaggable. A day is a spike when
    * `|n − mean_loo| > z·σ_loo`; a CONSTANT history (σ_loo = 0) flags
    * ANY deviation from it (dev reported null — the ratio is
    * undefined); `d = 1` has no baseline at all (dev null, no flag).
    * One row per (type, day): `(event_type, day, n, dev, is_spike)`.
    *
    * Scale shape: the corpus collapses to the types × days count table
    * (one shuffle, map-combined); stats re-aggregate that table with
    * DECIMAL-exact Σn / Σn² (order-free — leave-one-out needs only the
    * GLOBAL sums: `mean_i = (Σn − nᵢ)/(d−1)`), and the flag join is a
    * broadcast of the types-cardinality stats row. The IEEE finish
    * (mean, σ, dev) is a fixed sequence snapped to 4. */
  def volumeAnomaly(events: DataFrame, typ: Column, ts: Column,
                    z: Double): DataFrame =
    volumeAnomalyFromCounts(volumeCounts(events, typ, ts), z)

  /** [[volumeAnomaly]]'s sufficient statistic: the `(t, dd, n)` daily
    * count table — ADDITIVE, so per-batch tables fold exactly under any
    * arrival split (the streaming arm's state,
    * `streaming/ActiveStream`). */
  def volumeCounts(events: DataFrame, typ: Column, ts: Column)
      : DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    events
      .select(typ.as("t"), datediff(to_date(ts), epoch).as("dd"))
      .filter(col("t").isNotNull && col("dd").isNotNull)
      .groupBy(col("t"), col("dd")).agg(count(lit(1)).as("n"))
  }

  /** [[volumeAnomaly]] over a pre-aggregated `(t, dd, n)` count table. */
  def volumeAnomalyFromCounts(cnt: DataFrame, z: Double): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val epoch = to_date(lit("1970-01-01"))
    val dec = "decimal(38,0)"
    // n² in DECIMAL (not long·long — a >3e9/day feed would overflow
    // the long multiply under ANSI where the oracle's HUGEINT doesn't)
    val stats = cnt.groupBy(col("t"))
      .agg(count(lit(1)).as("d"),
        sum(col("n").cast(dec)).as("s1"),
        sum(col("n").cast(dec) * col("n").cast(dec)).as("s2"))
    // leave-one-out baseline from the GLOBAL sums: the tested day is
    // excluded from its own mean/σ (see the operator doc for why)
    val nD = col("n").cast("double")
    // clamp to 1 for d = 1 — that row's outputs are forced null/false
    // below, but ANSI mode would throw on the division itself
    val dm1 = greatest(col("d") - 1L, lit(1L)).cast("double")
    val mean = (col("s1").cast("double") - nD) / dm1
    val vr = (col("s2").cast("double") - nD * nD) / dm1 - mean * mean
    val sd = sqrt(greatest(vr, lit(0.0)))
    val withStats = cnt.join(broadcast(stats), Seq("t"))
    val dev = (nD - mean) / sd
    // structural constant-history test, EXACT in decimal: the d−1
    // leave-one-out days are all equal iff (d−1)·(Σn² − nᵢ²) equals
    // (Σn − nᵢ)². The IEEE `sd === 0.0` alone misfires once daily
    // counts pass ~2²⁶ (n·n > 2⁵³ rounds in the double cast): a truly
    // constant history yields a tiny nonzero sd and a z-test against a
    // near-zero sigma. sd === 0.0 is KEPT as a second guard for the
    // converse (non-constant history whose sd cancels to 0.0 in
    // doubles) so dev never divides by IEEE zero.
    val nDec = col("n").cast(dec)
    val looVar = (col("d") - 1L).cast(dec) * (col("s2") - nDec * nDec)
    val isConst = looVar === (col("s1") - nDec) * (col("s1") - nDec)
    val flagAny = isConst || sd === 0.0
    withStats.select(col("t").as("event_type"),
      date_add(epoch, col("dd").cast("int")).as("day"), col("n"),
      when(col("d") === 1L || flagAny, lit(null).cast("double"))
        .otherwise(round(dev, 4)).as("dev"),
      when(col("d") === 1L, lit(false))
        .when(flagAny, abs(nD - mean) > 0.0)
        .otherwise(abs(nD - mean) > sd * z)
        .as("is_spike"))
  }
}
