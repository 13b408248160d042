package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history construction — turn a
  * change-event stream into validity intervals per key: order each key's
  * events, drop no-op changes (the tracked attribute equals its previous
  * value), then close each surviving version with the next version's
  * start time (`valid_to`, null for the current version).
  *
  * This is the batch form of the warehouse MERGE/SCD2 pattern (the same
  * interval semantics as Delta/Hudi history tables), expressed as two
  * key-partitioned windows over ONE shuffle: both windows partition by
  * the same key columns, so Catalyst reuses the exchange and the whole
  * build is a single hash-partition pass — no global sort, no self-join.
  * At 100 TB the cost is one shuffle of the change stream on its key;
  * per-key state is the key's event count (bounded by update frequency,
  * not corpus size).
  */
object Scd {

  /** Build SCD2 validity intervals.
    *
    * @param df       change events, one row per observed state
    * @param keyCols  entity key (the dimension's natural key)
    * @param ts       event time of the change
    * @param tieBreak total-order tie break for equal timestamps
    * @param attr     the tracked attribute: consecutive equal values are
    *                 collapsed into one version (no-op change suppression)
    * @param carry    extra columns carried onto the version row
    */
  def scd2(df: DataFrame, keyCols: Seq[String], ts: Column, tieBreak: Column,
           attr: Column, carry: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ts.asc, tieBreak.asc)
    // no-op suppression: keep a row only when the attribute differs from
    // the key's previous observation (null-safe — the first row survives)
    val changed = df
      .withColumn("__prev", lag(attr, 1).over(w))
      .where(col("__prev").isNull || !(attr <=> col("__prev")))
      .drop("__prev")
    // same partition keys → the second window reuses the first's exchange
    changed
      .withColumn("valid_to", lead(ts, 1).over(w))
      .select(keyCols.map(col) ++ Seq(attr.as("version_value"),
        ts.as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")) ++ carry: _*)
  }
}
