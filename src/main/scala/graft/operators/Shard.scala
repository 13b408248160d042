package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Token-budget sharding: a distributed exclusive prefix sum over a
  * global order (§2.10 extension surface — splitting a corpus into
  * token-bounded shards/files for training ingestion).
  *
  * Each row gets `shard = floor(exclusive_prefix_sum(weight) / budget)`
  * under the total order of `orderCol` — i.e. shard k covers the weight
  * range [k·budget, (k+1)·budget). Equivalent SQL is a running-sum
  * window with no PARTITION BY, which Spark executes by moving the whole
  * table into ONE task (the WindowExec "No Partition Defined" path) —
  * exactly what cannot work at 100 TB. This operator replaces that with
  * the classic two-phase scan:
  *
  *   1. `repartitionByRange(orderCol)` + in-partition sort gives a
  *      sorted global order with balanced ranges (sampled bounds, so
  *      skewed keys still balance);
  *   2. one pass computes per-partition weight totals — `partitions`
  *      tuples of metadata collected to the driver (same class as the
  *      seed codebook; this is NOT a data collect) and turned into
  *      per-partition exclusive offsets;
  *   3. a second pass streams each sorted partition, adding its offset —
  *      map-side, no further shuffle.
  *
  * Total cost: ONE range shuffle. Both passes hang off the SAME RDD
  * object — not two Datasets over one logical plan, which would compile
  * two independent physical plans whose sampled range bounds and
  * AQE-coalesced partition counts need not agree, silently misaligning
  * the offsets (observed at 4 partitions). Sharing the RDD pins one
  * partitioning for both passes and lets pass 3 reuse pass 2's computed
  * shuffle stage (scheduler stage reuse), so nothing is persisted —
  * deliberately chosen over persist/localCheckpoint, which would pin an
  * input-sized cache for the life of the call (the round-5 verdict's
  * persist-leak class). This is the legitimate RDD case: per-partition
  * imperative state (a running sum) that must see one fixed partitioning
  * across two jobs. Result equals the single-task window's answer bit
  * for bit.
  */
object Shard {

  /** Assign `shard` ids by accumulating `weightCol` (cast to long) in
    * `orderCol` (long) order against `budget` per shard. Output columns:
    * (orderCol, weightCol, shard). Contract: both columns non-null and
    * weights non-negative (ids and token counts in every registered
    * use); a null would fail the tuple encoder loudly, not corrupt.
    * `startWeight` seeds the global prefix sum (default 0): the
    * streaming arm passes the accumulated weight of everything already
    * sharded, so an incremental batch lands exactly where the one-shot
    * pass over the whole corpus would have put it. */
  def byBudget(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, partitions: Int = 0,
      startWeight: Long = 0L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(startWeight >= 0, s"startWeight must be >= 0, got $startWeight")
    val spark = df.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pairEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    import spark.implicits._
    // ONE RDD object shared by both passes: fixed partitioning, computed
    // map stage reused by the second job
    val sorted = df
      .select(col(orderCol).cast("long").as("__ord"),
        col(weightCol).cast("long").as("__w"))
      .repartitionByRange(p, col("__ord"))
      .sortWithinPartitions("__ord")
      .as[(Long, Long)](pairEnc)
      .rdd
    // pass 2: per-partition totals — one metadata tuple per partition
    val totals = sorted
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator.single((pid, s))
      }
      .collect()
    val offsets = new Array[Long](totals.length)
    var acc = startWeight
    totals.sortBy(_._1).foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 3: stream each sorted partition adding its exclusive offset
    sorted
      .mapPartitionsWithIndex { (pid, it) =>
        var run = bc.value(pid)
        it.map { case (ord, w) =>
          val shard = run / budget
          run += w
          (ord, w, shard)
        }
      }
      .toDF(orderCol, weightCol, "shard")
  }
}
