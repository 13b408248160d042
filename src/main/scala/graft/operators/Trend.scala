package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares trend fit — `y = intercept + slope·x`
  * per group, the analytics staple behind scaling-law fits, per-source
  * length-vs-token trends, and drift lines over time buckets.
  *
  * Computed from the five SUFFICIENT STATISTICS (Σx, Σy, Σx², Σxy, Σy²,
  * plus n): each is a one-pass sum of integer-valued inputs accumulated
  * in DECIMAL(38,0) — exact at any corpus size, order-free, the repo's
  * dsum discipline — so the whole fit is ONE map-side scan plus a
  * groups-cardinality aggregate; no second pass, no residual join, and
  * the statistics are additive (a streaming arm can fold batches into
  * them exactly). The closed-form slope/intercept/R² arithmetic then
  * runs in a FIXED IEEE expression over the decimal-cast sums — both
  * engines replay it bit-for-bit. The textbook uncentered formula can
  * cancel catastrophically when x's spread is tiny relative to its
  * magnitude; that costs accuracy digits, never determinism (the oracle
  * replays the identical expression), and integer feature grains keep it
  * far from pathological.
  *
  * Degenerate groups by contract: `slope`/`intercept`/`r2` are null when
  * x is constant within the group (zero x-variance — no line exists);
  * `r2` alone is null when y is constant (the fit is exact but R² is
  * 0/0). Inputs must be integer-valued (they're cast to long — the exact
  * grain; snap real-valued features to a fixed point first).
  */
object Trend {

  def olsByGroup(df: DataFrame, grp: Column, x: Column, y: Column)
      : DataFrame = {
    val xd = x.cast("long").cast("decimal(19,0)")
    val yd = y.cast("long").cast("decimal(19,0)")
    val stats = df
      .filter(x.isNotNull && y.isNotNull)
      .groupBy(grp.as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(xd).cast("decimal(38,0)").as("sx"),
        sum(yd).cast("decimal(38,0)").as("sy"),
        sum((xd * xd).cast("decimal(38,0)")).as("sxx"),
        sum((xd * yd).cast("decimal(38,0)")).as("sxy"),
        sum((yd * yd).cast("decimal(38,0)")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val num = nD * col("sxy").cast("double") - sxD * syD
    val denX = nD * col("sxx").cast("double") - sxD * sxD
    val denY = nD * col("syy").cast("double") - syD * syD
    val slope = when(denX === 0.0, lit(null).cast("double"))
      .otherwise(num / denX)
    stats.select(col("grp"), col("n"),
      round(sxD / nD, 6).as("mean_x"),
      round(syD / nD, 6).as("mean_y"),
      round(slope, 6).as("slope"),
      round((syD - slope * sxD) / nD, 6).as("intercept"),
      round(when(denX === 0.0 || denY === 0.0, lit(null).cast("double"))
        .otherwise((num * num) / (denX * denY)), 6).as("r2"))
  }

  /** Grouped (delete-one-group) jackknife for a RATIO metric
    * `θ = Σnum / Σden` — the uncertainty number every corpus-level
    * metric report should carry but almost never does: documents
    * within a source are correlated, so the i.i.d. row-level standard
    * error is fiction; deleting whole GROUPS (sources/domains) is the
    * standard fix (the grouped/cluster jackknife). [[jackknifePanel]]
    * emits one row per group — `(grp, theta_loo, influence)` with
    * `influence = (g−1)·(θ − θ₍ᵢ₎)`, the classic "which source drags
    * the corpus metric" ranking; [[jackknifeSummary]] collapses to one
    * row `(n_groups, theta, jack_mean, jack_se, ci_lo, ci_hi)` with
    * `SE² = (g−1)/g · Σ(θ₍ᵢ₎ − θ̄₍·₎)²` and a normal-approximation 95%
    * interval.
    *
    * Exactness: num/den snap to 1e-6 fixed point into per-group
    * DECIMAL sums (one corpus scan, order-free); every θ₍ᵢ₎ is then a
    * fixed IEEE sequence over those exact sums, and the SE's
    * cross-group Σ squares snaps each term to 1e-12 fixed point before
    * its DECIMAL sum — so nothing depends on row or group order. A
    * group holding ALL the denominator mass (D − d_g = 0) yields null
    * θ_loo and is excluded from the SE (documented contract; it means
    * g is effectively 1 and no resampling-based error exists). */
  def jackknifePanel(df: DataFrame, grp: Column, num: Column,
                     den: Column): DataFrame = {
    val s = jackknifeLoo(jackknifeGroupSums(df, grp, num, den))
    val g = col("g").cast("double")
    val theta = col("tn").cast("double") / col("td").cast("double")
    s.select(col("grp"),
        round(col("th_loo"), 6).as("theta_loo"),
        round((g - 1.0) * (theta - col("th_loo")), 6).as("influence"))
  }

  /** One-row jackknife summary — see [[jackknifePanel]]. */
  def jackknifeSummary(df: DataFrame, grp: Column, num: Column,
                       den: Column): DataFrame =
    jackknifeSummaryFromSums(jackknifeGroupSums(df, grp, num, den))

  /** [[jackknifeSummary]] over a pre-aggregated `(grp, n_g, d_g)`
    * per-group decimal sum table (the streaming arm's grain —
    * additive, so batches fold exactly under any arrival split). */
  def jackknifeSummaryFromSums(sums: DataFrame): DataFrame = {
    val s = jackknifeLoo(sums)
    val t9 = round(col("th_loo") * 1e9).cast("long")
    val live = s.filter(col("th_loo").isNotNull)
      .select(col("tn"), col("td"), t9.as("t9"))
    val agg = live.agg(count(lit(1)).as("g"),
      max(col("tn")).as("tn"), max(col("td")).as("td"),
      sum(col("t9").cast("decimal(38,0)")).as("s9"))
    val gD = col("g").cast("double")
    val theta = col("tn").cast("double") / col("td").cast("double")
    val jackMean = col("s9").cast("double") / 1e9 / gD
    val withMean = agg.crossJoin(broadcast(live.select(col("t9"))))
    // Σ(θ_i − θ̄)² with each term snapped to 1e-12 before the sum
    val term = round(
      (col("t9").cast("double") / 1e9 - jackMean) *
        (col("t9").cast("double") / 1e9 - jackMean) * 1e12).cast("long")
    val fin = withMean.select(col("g"), col("tn"), col("td"),
        col("s9"), term.as("t12"))
      .groupBy(col("g"), col("tn"), col("td"), col("s9"))
      .agg(sum(col("t12").cast("decimal(38,0)")).as("ss"))
    val se = sqrt((gD - 1.0) / gD *
      (col("ss").cast("double") / 1e12))
    fin.select(col("g").as("n_groups"),
      round(theta, 6).as("theta"),
      round(col("s9").cast("double") / 1e9 / gD, 6).as("jack_mean"),
      round(se, 6).as("jack_se"),
      round(theta - lit(1.96) * se, 6).as("ci_lo"),
      round(theta + lit(1.96) * se, 6).as("ci_hi"))
  }

  /** [[jackknifeSummary]]'s sufficient statistic: per-group exact
    * decimal sums `(grp, n_g, d_g)` of the 1e-6-snapped num/den —
    * ADDITIVE, hence the streaming state grain. */
  def jackknifeGroupSums(df: DataFrame, grp: Column, num: Column,
                         den: Column): DataFrame = {
    val dec = "decimal(38,0)"
    df.select(grp.as("grp"),
        round(num.cast("double") * 1e6).cast("long").as("n6"),
        round(den.cast("double") * 1e6).cast("long").as("d6"))
      .filter(col("grp").isNotNull && col("n6").isNotNull &&
        col("d6").isNotNull)
      .groupBy(col("grp"))
      .agg(sum(col("n6").cast(dec)).as("n_g"),
        sum(col("d6").cast(dec)).as("d_g"))
  }

  /** Shared per-group leave-one-out table: `(grp, g, tn, td, th_loo)`
    * — exact decimal totals replicated onto each group row. */
  private def jackknifeLoo(sums: DataFrame): DataFrame = {
    val tot = sums.agg(count(lit(1)).as("g"),
      sum(col("n_g")).as("tn"), sum(col("d_g")).as("td"))
    sums.crossJoin(broadcast(tot))
      .select(col("grp"), col("g"), col("tn"), col("td"),
        when((col("td") - col("d_g")).cast("double") === 0.0,
          lit(null).cast("double"))
          .otherwise((col("tn") - col("n_g")).cast("double") /
            (col("td") - col("d_g")).cast("double")).as("th_loo"))
  }
}
