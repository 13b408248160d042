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
}
