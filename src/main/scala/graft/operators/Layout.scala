package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) interleaving for
  * file-skipping at scale.
  *
  * A 100 TB table is pruned by parquet min/max footer stats: a scan with a
  * predicate on `x` skips a file only if the file's x-range excludes the
  * value. Sorting by `x` makes x-ranges narrow but leaves `y`-ranges as
  * wide as the table, so two-column workloads prune on one column only.
  * Interleaving the bits of both columns (the Z-order curve) and range-
  * writing by that key gives every file a narrow range in BOTH columns —
  * each file covers a small square of the (x, y) grid instead of a thin
  * full-height stripe. The standard Delta/Iceberg `OPTIMIZE ZORDER BY`
  * trick, built here from plain codegen'd bit arithmetic — no UDF.
  *
  * `zValue` quantizes each column to `bits` bits against its [min, max]
  * range (rank-less linear quantization — monotone per column, which is
  * all the curve needs) and interleaves: bit i of x lands at 2i, bit i of
  * y at 2i+1. Pure `shiftleft`/`bitwise` expressions, so the value —
  * and any oracle — reproduces it exactly.
  *
  * Scale shape: computing z is map-side; `writeZOrdered` adds ONE range
  * exchange on z (the same shuffle any layout rewrite pays) and writes
  * `files` output files. The win is read-side and permanent: every
  * subsequent two-column scan prunes ~sqrt(files) instead of ~files.
  * Measured in LayoutSpec: per-file spans of BOTH columns shrink vs a
  * one-column sort layout.
  */
object Layout {

  /** Morton/Z value of (x, y): each quantized to `bits` bits over
    * [lo, hi], bits interleaved x-even / y-odd. Monotone quantization:
    * q = floor((v - lo) * ((2^bits - 1) / (hi - lo))). Inputs outside
    * [lo, hi] clamp. */
  def zValue(x: Column, y: Column, xLo: Long, xHi: Long, yLo: Long,
      yHi: Long, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(xHi > xLo && yHi > yLo, "empty quantization range")
    val qMax = (1L << bits) - 1
    require((xHi - xLo) <= (1L << 53) / qMax && (yHi - yLo) <= (1L << 53) / qMax,
      s"range too wide for exact $bits-bit quantization (product must stay < 2^53)")
    def quant(v: Column, lo: Long, hi: Long): Column = {
      val clamped = least(greatest(v.cast("long"), lit(lo)), lit(hi))
      // exact integer floor-division (Column./ is DOUBLE division, whose
      // rounding could flip a quantization bucket): subtracting the pmod
      // remainder first makes the numerator an exact multiple of the
      // divisor, so the double division yields the integer quotient
      // EXACTLY while (hi-lo)*qMax < 2^53 (the numerator's double is
      // exact) — enforced below rather than assumed
      val prod = (clamped - lit(lo)) * lit(qMax)
      ((prod - pmod(prod, lit(hi - lo))) / lit(hi - lo)).cast("long")
    }
    val qx = quant(x, xLo, xHi)
    val qy = quant(y, yLo, yHi)
    (0 until bits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` into `files` parquet files range-partitioned by the
    * Z value of (x, y) — each output file covers a compact square-ish
    * region of the two-column grid, so min/max footer pruning works for
    * predicates on EITHER column. */
  def writeZOrdered(df: DataFrame, path: String, x: String, y: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long, files: Int,
      bits: Int = 16): Unit =
    df.withColumn("__z",
        zValue(col(x), col(y), xLo, xHi, yLo, yHi, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
