package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to every interval that contains
  * them (SURVEY.md §2.10 extension surface; the second classic operator
  * Spark lacks natively, next to the as-of join).
  *
  * Spark's own planner turns `p.ts BETWEEN i.start AND i.end` (plus key
  * equality) into a join whose range predicate is evaluated POST-join —
  * on hot keys that is |points_key| × |intervals_key| rows. The standard
  * distributed shape instead buckets time:
  *
  *   - each point lands in exactly ONE fixed-width bucket;
  *   - each interval replicates to every bucket it covers;
  *   - the join is a plain equi-join on (keys…, bucket), with the exact
  *     containment test as a post-join filter.
  *
  * Because a point has exactly one bucket, each matching (point, interval)
  * pair is produced exactly once — no dedup pass. Cost scales with
  * points + Σ interval_length/bucket_width; pick `bucketSeconds` near the
  * typical interval length so replication stays O(1) per interval.
  * Containment is closed on both ends ([start, end]); intervals with
  * end < start are dropped.
  */
object RangeJoin {

  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          keys: Seq[String], pointTs: String,
                          startTs: String, endTs: String,
                          bucketSeconds: Long,
                          intervalPrefix: String = "iv_"): DataFrame = {
    def bucketOf(ts: Column): Column =
      floor(ts.cast("timestamp").cast("long") / bucketSeconds)

    val p = points.withColumn("__bucket", bucketOf(col(pointTs)))
    val ivCols = intervals.columns
    val i = intervals
      .filter(col(endTs).cast("timestamp") >= col(startTs).cast("timestamp"))
      .select(ivCols.map(c => col(c).as(intervalPrefix + c)) :+
        explode(sequence(bucketOf(col(startTs)), bucketOf(col(endTs))))
          .as("__bucket"): _*)

    val keyCond = keys.map(k => p(k) === i(intervalPrefix + k))
      .foldLeft(p("__bucket") === i("__bucket"))(_ && _)
    p.join(i, keyCond)
      .filter(col(intervalPrefix + startTs).cast("timestamp") <= col(pointTs).cast("timestamp") &&
        col(pointTs).cast("timestamp") <= col(intervalPrefix + endTs).cast("timestamp"))
      .drop("__bucket") // drops both sides' bucket columns
  }
}
