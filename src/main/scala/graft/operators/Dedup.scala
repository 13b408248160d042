package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.5 A1/A2 + §2.10 extensions).
  *
  * A1 `priorityDedup` re-expresses the reference's `filterDuplicates`
  * (OmmCancellationHandler.java:168–204): group by key, keep the highest-
  * priority row, break ties by recency. The reference takes `.get(0)` of the
  * CANCELED list — i.e. incidental result-set order (ORDER BY last_modified,
  * cancellations_current_future.sql:39); we impose an explicit deterministic
  * total order instead (SURVEY.md §7 hard part 1).
  *
  * At scale: one shuffle on the dedup key, then a per-partition sort — the
  * window never materializes a group in memory beyond the frame row, and with
  * `row_number`+filter Spark uses a running rank, not a full buffer.
  */
object Dedup {

  /** A1: keep exactly one row per `keys`: lowest `priority` first (0 beats 1),
    * then latest `ts`, then smallest `tieBreak` (total order → deterministic). */
  def priorityDedup(df: DataFrame, keys: Seq[String], priority: Column,
                    ts: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(priority.asc, ts.desc, tieBreak.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A2: batch-over-batch diff ≙ logChangesInCancellations
    * (OmmCancellationHandler.java:206–226). The reference's O(n²) nested loop
    * becomes a hash left-anti join. Returns (new, repeated) counts as one row. */
  def batchDiffCounts(curr: DataFrame, prev: DataFrame, key: String): DataFrame = {
    val c = curr.select(col(key)).distinct()
    val p = prev.select(col(key)).distinct().withColumnRenamed(key, "__pk")
    c.join(p, c(key) === col("__pk"), "left")
      .agg(
        count(when(col("__pk").isNull, 1)).as("new_keys"),
        count(when(col("__pk").isNotNull, 1)).as("repeated_keys"))
  }

  /** Rows of `curr` whose key is absent from `prev` (change capture). */
  def newRows(curr: DataFrame, prev: DataFrame, keys: Seq[String]): DataFrame =
    curr.join(prev.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** 128 bits of key hash (two independently-seeded xxhash64 lanes):
    * shuffling an exact-dedup of document text on the raw key ships the
    * full text bytes through the exchange; the hash pair ships 16 bytes
    * with ~2⁻¹²⁸ per-pair collision odds — the standard content-dedup
    * trade at corpus scale. */
  private def keyHash128(key: Column): Column =
    struct(xxhash64(key), xxhash64(key, lit(1)))

  /** Exact duplicate groups by arbitrary key expression: representative =
    * min(id), plus copy count. One shuffle, keyed on a 128-bit hash of the
    * key rather than the key bytes. */
  def exactDupGroups(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(keyHash128(key).as("dup_key"))
      .agg(min(id).as("representative_id"), count(lit(1)).as("n_copies"))

  /** Keep one representative row per exact key (smallest `id` wins). */
  def exactDedup(df: DataFrame, key: Column, id: Column): DataFrame = {
    val w = Window.partitionBy(keyHash128(key)).orderBy(id.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
