package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe persistence for the tiny driver-merged sketch state
  * directories (KMV / quantile / count-min / Misra–Gries incremental
  * ingest). The state is metadata-sized (≤ k, depth×width, or counters+1
  * rows), but a `mode("overwrite")` write straight onto the live path is
  * delete-then-write: a crash between the two loses the ENTIRE accumulated
  * sketch, i.e. every batch ingested so far.
  *
  * Protocol (single writer assumed — these are driver-side ingest steps of
  * one streaming job; concurrent ingests to one path are out of contract
  * and would race whichever storage layer they run on):
  *  1. write the new state to `<path>.__swap` (overwrite — a dead previous
  *     swap is clobbered);
  *  2. delete the live path;
  *  3. rename the swap dir onto the live path.
  * A crash in (1) leaves the live state untouched; a crash between (2)
  * and (3) leaves a COMPLETE swap dir (parquet's `_SUCCESS` marker is the
  * completeness witness) that [[exists]]/[[read]] adopt on the next call,
  * so the accumulated state survives every crash point. A complete swap
  * alongside a live dir (crash inside (2), or before it) is NOT adopted:
  * the writer never reported success for that batch, so at-most-once is
  * the correct recovery.
  */
object SketchState {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def swapPath(statePath: String) = new Path(statePath + ".__swap")

  /** True when state exists, first completing an interrupted swap (live
    * missing + complete swap present → rename swap into place). */
  def exists(spark: SparkSession, statePath: String): Boolean = {
    val live = new Path(statePath)
    val fs = fsOf(spark, live)
    if (!fs.exists(live)) {
      val swap = swapPath(statePath)
      // a failed adoption rename must THROW (as write() does): swallowing
      // it makes the accumulated state look absent, so the caller restarts
      // from empty and the next write() clobbers the only surviving copy
      if (fs.exists(new Path(swap, "_SUCCESS")) && !fs.rename(swap, live))
        throw new java.io.IOException(
          s"SketchState: swap adoption rename $swap -> $live failed")
    }
    fs.exists(live)
  }

  /** The live state as a DataFrame (recovers an interrupted swap first).
    * Throws like `spark.read.parquet` when no state was ever written. */
  def read(spark: SparkSession, statePath: String): DataFrame = {
    exists(spark, statePath)
    spark.read.parquet(statePath)
  }

  /** Replace the state with `df` (state is metadata-sized, so the
    * single-partition layout IS the right one). */
  def write(df: DataFrame, statePath: String): Unit =
    swapReplace(df.coalesce(1), statePath)

  /** The raw write-swap-delete-rename protocol with the CALLER's layout —
    * the crash-safe replace for state that is NOT metadata-sized (e.g.
    * NearDupStream's corpus-scale band-index/doc-store compaction, which
    * repartitions by bytes). `df` may read from `statePath` itself: the
    * swap write materializes the full copy before the live dir is
    * touched. Same single-writer contract as [[write]]. */
  def swapReplace(df: DataFrame, statePath: String): Unit =
    swapReplaceWrite(df, statePath, identity)

  /** [[swapReplace]] for a hive-partitioned state layout (e.g. the
    * streaming IVF-PQ codes index partitioned by list_id): same
    * write-swap / delete / rename discipline, the swap just carries the
    * partition directories. */
  def swapReplacePartitioned(df: DataFrame, statePath: String,
                             partitionCols: String*): Unit =
    swapReplaceWrite(df, statePath, _.partitionBy(partitionCols: _*))

  private def swapReplaceWrite(df: DataFrame, statePath: String,
      shape: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =>
        org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]): Unit = {
    val spark = df.sparkSession
    val live = new Path(statePath)
    val swap = swapPath(statePath)
    val fs = fsOf(spark, live)
    shape(df.write.mode("overwrite")).parquet(swap.toString)
    if (fs.exists(live)) fs.delete(live, true)
    if (!fs.rename(swap, live))
      throw new java.io.IOException(
        s"SketchState: rename $swap -> $live failed")
  }
}
