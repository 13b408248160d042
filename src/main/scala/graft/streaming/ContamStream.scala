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
  *                HIVE-PARTITIONED by `b = pmod(h1, N)` where N is the
  *                CURRENT bucket modulus (the [[IvfPqStream]] layout
  *                discipline: ingest layout == probe layout)
  *  - `docstats`  (id, n_shingles) one row per doc, appended on arrival
  *  - `hits`      (id, n_hits) per-batch overlap increments
  *
  * ADAPTIVE BUCKETING (default, `nBuckets = 0`): the modulus N starts at
  * 1 — a fresh stream's appends are layout-free (no per-batch shuffle, no
  * partitioned-compaction floor; the round-15 fixed-64 layout paid ~1 s
  * per poll of exactly that floor at fixture scale where the whole index
  * fits in one scan partition anyway). Once the index bytes EXCEED
  * N × `bucketTargetBytes` (the smallest size whose rounded-up power-of-2
  * ideal reaches 2 × N), the WHOLE index is rewritten at
  * N′ = nextPow2(bytes / bucketTargetBytes) (capped at `maxBuckets`) via
  * a crash-safe swap — doubling-triggered like [[SketchState
  * .compactIfNeeded]], so total rebucket cost over a stream's life is
  * O(index × log batches). The live modulus is a `_graft_nbuckets`
  * marker INSIDE the grams directory: every layout rewrite (rebucket and
  * compaction both) commits data + marker in one rename, so no crash
  * point can leave a reader pruning with a modulus the layout doesn't
  * have. Passing `nBuckets > 0` pins the legacy fixed layout (the spec's
  * exactness-at-any-modulus sweep and ScaleProbe's pruning-law witness
  * need a deterministic N).
  *
  * Scale shape per batch: one shingle explode of the BATCH (never the
  * accumulated corpus), one join of batch-grams against the bench set,
  * one join of the gram index against the benchmark INCREMENT — the
  * index side is corpus-sized but the probe side is increment-sized,
  * and the probe reads ONLY the increment's hash buckets (partition
  * pruning on `b`; matching index rows share the increment gram's h1,
  * hence its bucket). The pruning law is explicit: a k-gram increment
  * touches at most min(k, N) buckets — expected coverage
  * N·(1−(1−1/N)^k) — so SMALL increments (the production cadence: one
  * eval suite registered at a time, k ≈ 10²–10³ grams vs thousands of
  * buckets at 100 TB index scale) read a k/N sliver, while a bulk
  * backfill honestly degrades to the full scan it genuinely needs (its
  * grams cover every bucket). The final read joins two id-keyed metadata
  * tables (no text, no grams). */
object ContamStream {

  case class BatchResult(newDocs: Long, newBenchGrams: Long, newHits: Long)

  private def p(stateDir: String, leaf: String) = s"$stateDir/$leaf"

  private val NBucketsMarker = "_graft_nbuckets"

  private def gramHashes(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("id"),
        explode(TextExprs.wordShingles(col("text"), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("h1"),
        xxhash64(col("g"), lit(1)).as("h2"))
      .distinct()

  /** True when the directory holds at least one parquet part file —
    * distinguishes real index data from the marker-only residue a crash
    * between the first marker stamp and the first data append leaves
    * behind (reading parquet on a data-less dir fails schema inference).
    * Only consulted on cold/rare paths: the marker-absent open and the
    * old-docs probe guard — both listings of a fresh-or-small dir, and
    * the per-batch compaction already pays a full recursive listing. */
  private def hasPartFiles(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return false
    val it = fs.listFiles(path, true)
    var found = false
    while (!found && it.hasNext)
      found = it.next().getPath.getName.startsWith("part-")
    found
  }

  /** The gram index's live bucket modulus: the in-dir marker, or 1 for a
    * fresh/adaptive-initial layout. A pinned caller (`nBuckets > 0`) must
    * match the marker — mixing moduli on one state dir would probe with
    * a modulus the layout doesn't have. An adaptive caller REFUSES a
    * non-empty unmarked index for the same reason: with no marker there
    * is no way to tell a legacy modulus-1 layout from an N-bucket layout
    * whose marker was lost, and guessing 1 against N-bucket data silently
    * prunes the probe to bucket 0 only (missed contamination hits). */
  private def currentBuckets(spark: SparkSession, gramsPath: String,
                             pinned: Int): Int = {
    val marked = SketchState.readMarker(spark, gramsPath, NBucketsMarker)
      .map(_.trim.toInt)
    if (pinned > 0) {
      require(marked.forall(_ == pinned),
        s"gram index at $gramsPath has nBuckets=${marked.get}; " +
          s"caller pinned $pinned — the modulus is baked into the layout")
      pinned
    } else marked.getOrElse {
      require(!hasPartFiles(spark, gramsPath),
        s"gram index at $gramsPath has data but no $NBucketsMarker marker; " +
          "refusing to guess the bucket modulus — stamp the marker with " +
          "the layout's true modulus to re-open this state adaptively")
      1
    }
  }

  private def nextPow2(x: Long): Int = {
    var n = 1
    while (n < x && n < (1 << 30)) n <<= 1
    n
  }

  /** One micro-batch increment: `newDocs` (id, text) are corpus arrivals,
    * `newBench` (id, text) benchmark arrivals — either may be empty.
    * Corpus ids must be globally unique across the stream's life and
    * disjoint from benchmark membership (the batch operator's caller
    * contract). `nBuckets = 0` (default) = adaptive layout (see class
    * doc); `nBuckets > 0` pins that fixed modulus for the stream's life.
    * `bucketTargetBytes` is the adaptive target per bucket — size it to
    * the increment-probe read you want (a pruned probe reads
    * ~coverage × bucketTargetBytes per touched bucket). */
  def ingestBatch(spark: SparkSession, newDocs: DataFrame,
                  newBench: DataFrame, stateDir: String, n: Int = 3,
                  compactAfterFiles: Int = 64,
                  nBuckets: Int = 0,
                  bucketTargetBytes: Long = 256L << 20,
                  maxBuckets: Int = 4096): BatchResult = {
    require(nBuckets >= 0, s"nBuckets must be >= 0, got $nBuckets")
    require(bucketTargetBytes >= 1, "bucketTargetBytes must be >= 1")
    val benchPath = p(stateDir, "bench")
    val gramsPath = p(stateDir, "grams")
    val statsPath = p(stateDir, "docstats")
    val hitsPath = p(stateDir, "hits")
    // the modulus this batch appends AND probes with; a rebucket (end of
    // batch) only affects the NEXT batch's reads
    val nB = currentBuckets(spark, gramsPath, nBuckets)

    val nd = newDocs.select(col("id"), col("text")).persist()
    val nb = newBench.select(col("id"), col("text")).persist()
    try {
      val nNew = nd.count()
      val haveBenchState = SketchState.exists(spark, benchPath)

      // benchmark increment: grams NOT already in the accumulated set —
      // the anti-join is what makes re-registered grams count zero
      val newBenchGrams0 =
        if (nb.isEmpty) None // emptiness gate only — isEmpty stops at row 1
        else {
          val g = gramHashes(nb, n).select(col("h1"), col("h2")).distinct()
          Some(if (haveBenchState)
            g.join(spark.read.parquet(benchPath), Seq("h1", "h2"),
              "left_anti")
          else g)
        }
      val newBenchGrams = newBenchGrams0.map(_.persist())
      val nBenchInc = newBenchGrams.map(_.count()).getOrElse(0L)

      // no materializing count: the first consumer (the hits join, or the
      // docstats write) populates the persist — a separate count() job per
      // poll bought nothing (guide §1.2: don't add passes)
      val newDocGrams = if (nNew > 0) Some(gramHashes(nd, n).persist())
        else None

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
      // nothing. The bucket list is collected (bounded: ≤ nB ints) so
      // the restriction is a plan literal → static hive-partition
      // pruning at the file source, no runtime-filter machinery.
      // hasPartFiles, not bare exists: a crash between the first marker
      // stamp and the first data append leaves a marker-only grams dir,
      // which exists but has no readable parquet (and no hits to find)
      val hitsOld = newBenchGrams match {
        case Some(inc) if nBenchInc > 0 && hasPartFiles(spark, gramsPath) =>
          val bks = inc
            .select(pmod(col("h1"), lit(nB.toLong)).cast("int").as("b"))
            .distinct().collect().map(_.getInt(0)).toSeq
          Some(spark.read.parquet(gramsPath)
            .where(col("b").isin(bks: _*))
            .join(inc, Seq("h1", "h2"))
            .groupBy(col("id")).agg(count(lit(1)).as("n_hits")))
        case _ => None
      }
      // the total-hit metric rides the hits append as an observed metric —
      // the write is hits' only consumer, so the old persist + separate
      // aggregate job per poll was a whole extra plan cycle (guide §1.2)
      val hits = (hitsNew ++ hitsOld).reduceOption(_ unionByName _)
      val hitsObs = new org.apache.spark.sql.Observation()

      // appends: increments only, never a rewrite of accumulated state.
      // The gram index appends in its bucket layout; at nB > 1,
      // repartition(b) clusters each bucket's rows into one task so a
      // batch adds at most min(nB, its distinct buckets) files — at
      // nB == 1 (adaptive initial) the clustering shuffle buys nothing
      // (one bucket) and is skipped; compaction owns the file count.
      // r19 (guide §2.6): the four appends land in four INDEPENDENT state
      // dirs with no mutual ordering contract (marker-before-data is
      // internal to the grams unit), so they run as concurrent jobs —
      // per-poll wall at fixture scale is mostly driver-side plan/commit
      // latency, which overlaps instead of summing. Crash class unchanged:
      // an interrupted poll leaves a partial batch across dirs and is
      // re-run, exactly as with the sequential appends.
      val appendUnits = Seq.newBuilder[() => Unit]
      hits.foreach(h => appendUnits += (() =>
        h.observe(hitsObs, coalesce(sum(col("n_hits")), lit(0L)).as("n"))
          .write.mode("append").parquet(hitsPath)))
      newDocGrams.foreach { dg =>
        appendUnits += (() =>
          dg.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
            .write.mode("append").parquet(statsPath))
        appendUnits += (() => {
          // first-ever append: stamp the live modulus BEFORE the data
          // lands. A marker without data is harmless (appends never change
          // the modulus, and readers guard on part files); data without a
          // marker is not — a pinned-modulus stream crashing after an
          // N-bucket append but before the stamp would leave a layout a
          // later adaptive open can only misread (currentBuckets now
          // refuses it).
          if (SketchState.readMarker(spark, gramsPath, NBucketsMarker).isEmpty)
            SketchState.writeMarker(spark, gramsPath, NBucketsMarker,
              nB.toString)
          val laid = dg.withColumn("b",
            pmod(col("h1"), lit(nB.toLong)).cast("int"))
          (if (nB > 1) laid.repartition(col("b")) else laid)
            .write.mode("append").partitionBy("b").parquet(gramsPath)
        })
      }
      newBenchGrams.foreach(bg => appendUnits +=
        (() => bg.write.mode("append").parquet(benchPath)))
      PollOps.inParallel(appendUnits.result())
      val nHits = if (hits.isEmpty) 0L
        else hitsObs.get.get("n").flatMap(Option(_))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
      PollOps.inParallel(Seq(benchPath, statsPath, hitsPath).map(pth =>
        () => { SketchState.compactIfNeeded(spark, pth, compactAfterFiles); () }))
      // rebucket FIRST: its swap already lands the whole index at one file
      // per bucket, so running compaction before it could pay two full
      // index rewrites back-to-back in one batch; compaction only runs
      // when no rebucket rewrote the index this batch
      val rebucketed = nBuckets == 0 &&
        rebucketIfNeeded(spark, gramsPath, nB, bucketTargetBytes,
          maxBuckets) != nB
      if (!rebucketed)
        SketchState.compactIfNeeded(spark, gramsPath, compactAfterFiles,
          partitionCols = Seq("b"))

      newDocGrams.foreach(_.unpersist())
      newBenchGrams.foreach(_.unpersist())
      BatchResult(nNew, nBenchInc, nHits)
    } finally {
      nd.unpersist(); nb.unpersist()
    }
  }

  /** Doubling-triggered layout growth: rewrite the gram index at
    * N′ = nextPow2(bytes / bucketTargetBytes) once that is ≥ 2 × N. The
    * rewrite is one crash-safe swap carrying BOTH the relaid partition
    * dirs and the updated `_graft_nbuckets` marker, so modulus and
    * layout are never observable split. Returns the new modulus. */
  private def rebucketIfNeeded(spark: SparkSession, gramsPath: String,
                               nB: Int, bucketTargetBytes: Long,
                               maxBuckets: Int): Int = {
    if (!SketchState.exists(spark, gramsPath)) return nB
    val path = new org.apache.hadoop.fs.Path(gramsPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var bytes = 0L
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.startsWith("part-")) bytes += s.getLen
    }
    val ideal = math.min(maxBuckets,
      nextPow2((bytes + bucketTargetBytes - 1) / bucketTargetBytes))
    if (ideal < 2 * nB) return nB
    SketchState.swapReplacePartitionedKeeping(
      spark.read.parquet(gramsPath)
        .withColumn("b", pmod(col("h1"), lit(ideal.toLong)).cast("int"))
        .repartition(col("b")),
      gramsPath, Seq("b"), Map(NBucketsMarker -> ideal.toString))
    ideal
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
