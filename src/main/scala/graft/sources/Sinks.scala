package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink helpers for cluster-scale layouts.
  *
  * - `writePartitioned`: directory-partitioned parquet — readers prune whole
  *   partitions on the partition column (e.g. the cancellation stream keyed
  *   by operating day, so a day's replay touches one directory).
  * - `writeBucketed`: hash-bucketed + sorted table — two tables bucketed the
  *   same way join with NO exchange on either side (verified in the spec by
  *   asserting the join plan is shuffle-free). This is the "pre-partition
  *   the big joins" story for repeated fact⋈fact joins at 100 TB.
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Seq.empty,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }
}
