package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs
import graft.operators.SketchState

/** Incremental benchmark decontamination over micro-batches — the §2.10
  * contamination family unified with the reference's micro-batch model
  * (≙ Main.java:53–66 scheduleAtFixedRate), completing the streaming
  * family beside near-dup / segment / semantic dedup.
  *
  * The real deployment regime is two INDEPENDENT slow feeds: corpus
  * documents keep arriving (crawl ingest), and the benchmark set ALSO
  * grows (new eval suites get registered). A contamination hit is a
  * (document gram, benchmark gram) identity; each hit must be counted
  * exactly once, no matter which side arrived first — re-scanning the
  * accumulated corpus per benchmark update (or the accumulated benchmark
  * per corpus batch) is the O(corpus × polls) cost this operator exists
  * to avoid.
  *
  * BATCH EQUIVALENCE (the property the spec pins): a hit (d, g) is
  * counted exactly when the LATER side arrives — new docs probe the
  * accumulated benchmark set PLUS this batch's benchmark increment;
  * previously-accumulated doc grams probe ONLY the increment (the
  * increment is anti-joined against the accumulated set first, so a
  * re-registered gram contributes nothing). Overlap counts are then
  * ADDITIVE, and for ANY split of corpus and benchmark into arrival
  * batches the final read EQUALS `Contamination.overlapVsBenchmark` over
  * the whole corpus — q62's oracle certifies q156 verbatim.
  *
  * State (checkpointed parquet, crash-safe via [[SketchState]]'s
  * swap-replace / adoption discipline; all four dirs get the shared
  * excess-triggered compaction):
  *  - `bench`     distinct benchmark gram hashes (h1, h2) — the 128-bit
  *                key of the batch operator, gram TEXT never persists
  *  - `grams`     (id, h1, h2) accumulated doc-gram index,
  *                HIVE-PARTITIONED by `b = pmod(h1, nBuckets)` (the
  *                [[IvfPqStream]] layout discipline: ingest layout ==
  *                probe layout)
  *  - `docstats`  (id, n_shingles) one row per doc, appended on arrival
  *  - `hits`      (id, n_hits) per-batch overlap increments
  *
  * Scale shape per batch: one shingle explode of the BATCH (never the
  * accumulated corpus), one join of batch-grams against the bench set,
  * one join of the gram index against the benchmark INCREMENT — the
  * index side is corpus-sized but the probe side is increment-sized,
  * and the probe reads ONLY the increment's hash buckets (partition
  * pruning on `b`; matching index rows share the increment gram's h1,
  * hence its bucket). The pruning law is explicit: a k-gram increment
  * touches at most min(k, nBuckets) buckets — expected coverage
  * nBuckets·(1−(1−1/nBuckets)^k) — so SMALL increments (the production
  * cadence: one eval suite registered at a time, k ≈ 10²–10³ grams vs
  * thousands of buckets at 100 TB index scale) read a k/nBuckets
  * sliver, while a bulk backfill honestly degrades to the full scan it
  * genuinely needs (its grams cover every bucket). The final read joins
  * two id-keyed metadata tables (no text, no grams). */
object ContamStream {

  case class BatchResult(newDocs: Long, newBenchGrams: Long, newHits: Long)

  private def p(stateDir: String, leaf: String) = s"$stateDir/$leaf"

  private def gramHashes(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("id"),
        explode(TextExprs.wordShingles(col("text"), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("h1"),
        xxhash64(col("g"), lit(1)).as("h2"))
      .distinct()

  /** One micro-batch increment: `newDocs` (id, text) are corpus arrivals,
    * `newBench` (id, text) benchmark arrivals — either may be empty.
    * Corpus ids must be globally unique across the stream's life and
    * disjoint from benchmark membership (the batch operator's caller
    * contract). `nBuckets` is the gram-index hash-bucket count; it must
    * stay CONSTANT across a stream's life (it is baked into the state
    * layout) — size it so the expected benchmark increment is smaller
    * than it (see the pruning law in the class doc). */
  def ingestBatch(spark: SparkSession, newDocs: DataFrame,
                  newBench: DataFrame, stateDir: String, n: Int = 3,
                  compactAfterFiles: Int = 64,
                  nBuckets: Int = 64): BatchResult = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val benchPath = p(stateDir, "bench")
    val gramsPath = p(stateDir, "grams")
    val statsPath = p(stateDir, "docstats")
    val hitsPath = p(stateDir, "hits")

    val nd = newDocs.select(col("id"), col("text")).persist()
    val nb = newBench.select(col("id"), col("text")).persist()
    try {
      val nNew = nd.count()
      val haveBenchState = SketchState.exists(spark, benchPath)

      // benchmark increment: grams NOT already in the accumulated set —
      // the anti-join is what makes re-registered grams count zero
      val newBenchGrams0 =
        if (nb.count() == 0L) None
        else {
          val g = gramHashes(nb, n).select(col("h1"), col("h2")).distinct()
          Some(if (haveBenchState)
            g.join(spark.read.parquet(benchPath), Seq("h1", "h2"),
              "left_anti")
          else g)
        }
      val newBenchGrams = newBenchGrams0.map(_.persist())
      val nBenchInc = newBenchGrams.map(_.count()).getOrElse(0L)

      val newDocGrams = if (nNew > 0) Some(gramHashes(nd, n).persist())
        else None
      newDocGrams.foreach(_.count())

      // hits for NEW docs: probe state ∪ increment (the full post-batch
      // benchmark set; state and increment are disjoint by construction)
      val benchAfter = (haveBenchState, newBenchGrams) match {
        case (true, Some(inc)) =>
          Some(spark.read.parquet(benchPath).unionByName(inc))
        case (true, None) => Some(spark.read.parquet(benchPath))
        case (false, inc) => inc
      }
      val hitsNew = (newDocGrams, benchAfter) match {
        case (Some(dg), Some(bg)) =>
          Some(dg.join(bg, Seq("h1", "h2"))
            .groupBy(col("id")).agg(count(lit(1)).as("n_hits")))
        case _ => None
      }
      // hits for OLD docs: the accumulated gram index probes ONLY the
      // increment — and only the increment's HASH BUCKETS of the index:
      // a matching index row carries the same h1, hence the same bucket,
      // so restricting the scan to the increment's bucket set loses
      // nothing. The bucket list is collected (bounded: ≤ nBuckets ints)
      // so the restriction is a plan literal → static hive-partition
      // pruning at the file source, no runtime-filter machinery.
      val hitsOld = newBenchGrams match {
        case Some(inc) if nBenchInc > 0 && SketchState.exists(spark, gramsPath) =>
          val bks = inc
            .select(pmod(col("h1"), lit(nBuckets.toLong)).cast("int").as("b"))
            .distinct().collect().map(_.getInt(0)).toSeq
          Some(spark.read.parquet(gramsPath)
            .where(col("b").isin(bks: _*))
            .join(inc, Seq("h1", "h2"))
            .groupBy(col("id")).agg(count(lit(1)).as("n_hits")))
        case _ => None
      }
      val hits = (hitsNew ++ hitsOld).reduceOption(_ unionByName _)
        .map(_.persist())
      val nHits = hits.map(_.agg(coalesce(sum(col("n_hits")), lit(0L)))
        .head().getLong(0)).getOrElse(0L)

      // appends: increments only, never a rewrite of accumulated state.
      // The gram index appends in its bucket layout — repartition(b)
      // clusters each bucket's rows into one task, so a batch adds at
      // most min(nBuckets, its distinct buckets) files, not tasks×dirs.
      hits.foreach(_.write.mode("append").parquet(hitsPath))
      newDocGrams.foreach { dg =>
        dg.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
          .write.mode("append").parquet(statsPath)
        dg.withColumn("b", pmod(col("h1"), lit(nBuckets.toLong)).cast("int"))
          .repartition(col("b"))
          .write.mode("append").partitionBy("b").parquet(gramsPath)
      }
      newBenchGrams.foreach(_.write.mode("append").parquet(benchPath))
      Seq(benchPath, statsPath, hitsPath)
        .foreach(SketchState.compactIfNeeded(spark, _, compactAfterFiles))
      SketchState.compactIfNeeded(spark, gramsPath, compactAfterFiles,
        partitionCols = Seq("b"))

      hits.foreach(_.unpersist())
      newDocGrams.foreach(_.unpersist())
      newBenchGrams.foreach(_.unpersist())
      BatchResult(nNew, nBenchInc, nHits)
    } finally {
      nd.unpersist(); nb.unpersist()
    }
  }

  /** The accumulated contamination table — identical to
    * `Contamination.overlapVsBenchmark(corpus-so-far, benchmark-so-far)`:
    * (id, n_shingles, n_overlap, contaminated). Joins two id-keyed
    * metadata tables; zero gram or text access. */
  def contamination(spark: SparkSession, stateDir: String): DataFrame = {
    val stats = SketchState.read(spark, p(stateDir, "docstats"))
    val hitsPath = p(stateDir, "hits")
    val overlap =
      if (SketchState.exists(spark, hitsPath))
        spark.read.parquet(hitsPath)
          .groupBy(col("id")).agg(sum(col("n_hits")).as("o"))
      else stats.select(col("id"), lit(0L).as("o")).limit(0)
    stats.join(overlap, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("o"), lit(0L)).as("n_overlap"),
        (coalesce(col("o"), lit(0L)) * 2 >= col("n_shingles"))
          .as("contaminated"))
  }
}
