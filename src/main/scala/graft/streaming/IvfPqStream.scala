package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Quantize, SketchState}

/** Incremental IVF-PQ index maintenance over micro-batches — the
  * streaming counterpart of [[graft.operators.Quantize.ivfPqResidualTopK]]
  * in the same foreachBatch-plus-on-disk-state architecture as
  * [[SegDedupStream]] / [[NearDupStream]].
  *
  * Each batch of new vectors is residual-PQ-encoded MAP-SIDE (codebooks
  * are fixed at index-build time, the standard IVF contract — re-training
  * is a rebuild, not an increment) and appended to a codes index laid out
  * `partitionBy(list_id)`. That layout is the point: the index on disk IS
  * the serving layout, so query-time probing partition-prunes to the
  * probed lists (DPP, measured in ScaleProbe `ops10`) without any
  * re-organization step between ingest and serve.
  *
  * BATCH EQUIVALENCE: encoding is a pure per-row function of the vector
  * and the fixed codebooks, so for ANY split of a corpus into batches the
  * accumulated index holds exactly the batch operator's codes, and
  * [[topK]] returns exactly what `ivfPqResidualTopK` returns over the
  * whole corpus (spec-pinned; q97's oracle is q95's SQL verbatim).
  * No ordering requirement at all — unlike dedup streams, there is no
  * cross-row decision to order.
  *
  * Scale shape per batch: encode is one map-side projection (no shuffle);
  * the append writes only the batch's partitions. The small-file wall —
  * one file per touched partition per batch — is bounded by the same
  * excess-triggered swap-replace compaction as the other streams, here
  * counting part-files RECURSIVELY across partition dirs and rewriting
  * the whole index partitioned (a full-index pass, amortized by the
  * excess trigger exactly as in NearDupStream.compactIfNeeded). */
object IvfPqStream {

  case class BatchResult(added: Long, stateFiles: Int)

  private def codesPath(stateDir: String) = s"$stateDir/codes"

  /** One micro-batch of new vectors. `newVecs` must carry the id and
    * vector under the given columns; ids must be unique stream-wide
    * (re-sent ids would index duplicate rows — dedup upstream). */
  def ingestBatch(spark: SparkSession, newVecs: DataFrame, stateDir: String,
                  id: Column, vec: Column,
                  coarse: Seq[(Int, Seq[Double])],
                  resCentroids: Seq[(Int, Seq[Double])], m: Int, dim: Int,
                  compactAfterFiles: Int = 64): BatchResult = {
    val path = codesPath(stateDir)
    SketchState.exists(spark, path) // adopt an interrupted compaction swap
    // emptiness gate first (stops at row 1, before any encode work): an
    // empty batch must not append an empty file-set into the state
    if (newVecs.isEmpty) return BatchResult(0, partFiles(spark, path))
    val listC = Quantize.ivfListCol(vec, coarse)
    // r18 (guide §1.2): `added` rides the append as an observed metric —
    // the write is the encode's only consumer now, so the old persist +
    // materializing count() paid a whole extra plan/job per poll (and
    // held the encoded batch in storage memory) for a number the write's
    // own tasks see.
    val obs = new org.apache.spark.sql.Observation()
    val codes = Quantize.pqEncode(newVecs, id,
        Quantize.ivfResidualCol(vec, coarse, listC),
        resCentroids, m, dim, keep = Seq(listC.as("list_id")))
      .drop("distortion")
      .observe(obs, count(lit(1)).as("n"))
    // one shuffle of the batch-bounded code rows so each touched list
    // writes exactly ONE file per batch — without it every scan task
    // writes a sliver into every list it sees (tasks × lists files per
    // batch), quadrupling small-file pressure and compaction frequency.
    // A hot list's batch rows land on one task, bounded by batch size.
    codes.repartition(col("list_id")).write.mode("append")
      .partitionBy("list_id").parquet(path)
    val added = obs.get.get("n").flatMap(Option(_))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    compactPartitionedIfNeeded(spark, path, compactAfterFiles)
    BatchResult(added, partFiles(spark, path))
  }

  /** Serve top-k from the accumulated index — exactly the batch
    * operator over the index's rows, probing nProbe lists with the
    * partition layout doing the pruning. */
  def topK(spark: SparkSession, stateDir: String, queries: DataFrame,
           id: String, vec: String, coarse: Seq[(Int, Seq[Double])],
           resCentroids: Seq[(Int, Seq[Double])], m: Int, dim: Int,
           nProbe: Int, k: Int): DataFrame = {
    // recover an interrupted compaction swap / tiered merge BEFORE the
    // scan plans: a crashed maintenance step must never serve a query
    // duplicated (mid-merge) or stale (unadopted swap) rows
    SketchState.exists(spark, codesPath(stateDir))
    Quantize.ivfPqResidualTopK(spark.read.parquet(codesPath(stateDir)),
      queries, id, vec, coarse, resCentroids, m, dim, nProbe, k)
  }

  private def partFiles(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.startsWith("part-")) n += 1
    }
    n
  }

  /** The shared excess-triggered compaction in its hive-partitioned
    * form ([[SketchState.compactIfNeeded]] with `partitionCols` —
    * list-clustered rewrite, recursive file count; ONE implementation
    * for every streaming store). */
  private[streaming] def compactPartitionedIfNeeded(spark: SparkSession,
      path: String, maxFiles: Int): Boolean =
    SketchState.compactIfNeeded(spark, path, maxFiles, Seq("list_id"))
}
