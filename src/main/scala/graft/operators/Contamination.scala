package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Benchmark decontamination (the GPT-3-paper step): per corpus document,
  * how many of its distinct word n-gram shingles appear in ANY benchmark
  * document.
  *
  * Scale shape: benchmark sets (test suites) are tiny against a 100 TB
  * corpus, so the benchmark's distinct shingle set is broadcast and the
  * corpus side stays map-side — one explode and one map-combined
  * per-document aggregate; the corpus is NEVER shuffled by shingle. The
  * join key is a 128-bit shingle hash, not the shingle string (same
  * 2⁻¹²⁸ collision argument as exact dedup; measured trade-offs in
  * TestdataQueries.q62Decontaminate).
  *
  * Output: (idCol, n_shingles, n_overlap, contaminated) where
  * `contaminated` = overlap fraction >= 1/2, computed as an integer
  * comparison (hash-exact, no float division). */
object Contamination {

  private def shingleKey(s: Column): Column =
    struct(xxhash64(s).as("h1"), xxhash64(s, lit(1)).as("h2"))

  /** `corpus` and `benchmark` both carry (id, text) via the given
    * columns; corpus docs whose id appears in the benchmark should be
    * excluded by the caller (their overlap is trivially 1). */
  def overlapVsBenchmark(corpus: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int = 3): DataFrame =
    overlapImpl(corpus, benchmark, id, text, n, bloomFpp = None)

  /** [[overlapVsBenchmark]] for benchmark sets too big to broadcast as
    * exact hashes: a Bloom filter over the benchmark shingle hashes
    * (built with Spark's distributed sketch aggregate, ~10 bits/element
    * at fpp 0.01 — 16× smaller than the 128-bit exact set) gates which
    * corpus shingles enter the EXACT confirmation join. No false
    * negatives, and every positive is confirmed, so the output is
    * IDENTICAL to the exact operator (spec-pinned) — the filter only
    * changes cost. Scale shape: non-candidate shingles (the vast
    * majority of a clean corpus) flow map-side into the per-doc count
    * aggregate and never shuffle; only bloom survivors (true overlaps +
    * fpp·distinct) carry into the join, so the confirmation join's
    * build side can be a SHUFFLED relation instead of a broadcast —
    * the regime where the exact set no longer fits on every executor.
    * The corpus is scanned/shingled twice (both passes map-side); that
    * trade buys never shuffling the corpus by shingle. */
  def overlapVsBenchmarkBloom(corpus: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int = 3,
      fpp: Double = 0.01): DataFrame =
    overlapImpl(corpus, benchmark, id, text, n, bloomFpp = Some(fpp))

  /** Cross-source n-gram overlap matrix — the inter-source contamination
    * panel of a corpus datasheet: for every pair of sources, how many
    * distinct word n-grams they share, with the overlap COEFFICIENT
    * `shared / min(|A|, |B|)` (not Jaccard: a small source wholly
    * contained in a big one should read as 1.0, the leakage signal).
    * High off-diagonal entries mean two "different" sources are the same
    * crawl twice — double-counted mixture weight and train/val leakage
    * when splits are drawn per source.
    *
    * Scale shape: ONE shuffle of distinct (source, gram-hash128) pairs
    * keyed by the gram hash (gram TEXT never shuffles — the q9/q109
    * 128-bit trade); the per-gram posting list is bounded by the SOURCE
    * COUNT (≤ groups, not corpus), so the pair explode is ≤ groups² per
    * gram and the result matrix is groups²-sized metadata. Per-source
    * distinct totals re-derive from the same deduplicated pair stream.
    * Sources must be low-cardinality (the mixing use case, same contract
    * as `Mix.sampleToBudget`). */
  def sourceOverlapMatrix(docs: DataFrame, source: Column, text: Column,
      n: Int = 3): DataFrame = {
    val sg = docs
      .select(source.as("src"), explode(TextExprs.wordShingles(text, n)).as("g"))
      .select(col("src"), xxhash64(col("g")).as("h1"),
        xxhash64(col("g"), lit(1)).as("h2"))
      .distinct()
    val posting = sg.groupBy(col("h1"), col("h2"))
      .agg(collect_list(col("src")).as("srcs"))
    val sizes = posting.select(explode(col("srcs")).as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("n_grams"))
    val pairs = posting
      .filter(size(col("srcs")) >= 2)
      .select(explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("src_a"), explode(col("srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(sizes.withColumnRenamed("src", "src_a")
        .withColumnRenamed("n_grams", "n_a")), Seq("src_a"))
      .join(broadcast(sizes.withColumnRenamed("src", "src_b")
        .withColumnRenamed("n_grams", "n_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
        col("n_b"),
        round(col("n_shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"), 6).as("overlap"))
  }

  /** [[sourceOverlapMatrix]] at SKETCH cost — the scale path when the
    * distinct (source, gram) universe is too big to shuffle: per source,
    * a k-bounded KMV sketch of its distinct gram hashes
    * ([[Sketch.kmvSketchByGroup]] — per-task memory O(sources × k), only
    * partitions × sources × k hashes exchanged); per source PAIR, the
    * Beyer et al. 2007 set-operation estimate over the merged bottom-k:
    *
    *   K = bottom-k of K(A) ∪ K(B);  J ≈ |K ∩ K(A) ∩ K(B)| / |K|
    *   |A∩B| ≈ J · est(A∪B);  overlap ≈ |A∩B| / min(est A, est B)
    *
    * When a pair's merged universe has < k distinct hashes the sketches
    * hold the FULL hash sets and every figure is exact (small-cardinality
    * fallback, spec-pinned against the exact matrix). The pair stage is
    * fully relational — sketch rows fan out to their ≤ sources² pairs via
    * a broadcast pair table (sources² × k rows, metadata-sized), the
    * per-pair bottom-k rank prunes map-side (WindowGroupLimit), and the
    * corpus itself is touched exactly once by the sketch pass. */
  def sourceOverlapMatrixSketch(docs: DataFrame, source: Column,
      text: Column, n: Int = 3, k: Int = 256): DataFrame = {
    val sh = docs.select(source.as("src"),
      explode(TextExprs.wordShingles(text, n)).as("g"))
    val sk = Sketch.kmvSketchByGroup(sh, col("src"), col("g"), k)
    val per = sk.groupBy(col("g").as("src"))
      .agg(count(lit(1)).as("n_x"), max(col("h")).as("kth"))
    val p = lit(1000000007.0)
    def est(nc: Column, kth: Column): Column =
      when(nc < k, nc.cast("double"))
        .otherwise(lit((k - 1).toDouble) * p / kth.cast("double"))
    val ests = per.select(col("src"), est(col("n_x"), col("kth")).as("est"))
    val pairs = ests.select(col("src").as("src_a"), col("est").as("est_a"))
      .crossJoin(ests.select(col("src").as("src_b"), col("est").as("est_b")))
      .filter(col("src_a") < col("src_b"))
    val union = sk.join(broadcast(pairs),
        col("g") === col("src_a") || col("g") === col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("g") === col("src_a")).as("in_a"),
        max(col("g") === col("src_b")).as("in_b"),
        first(col("est_a")).as("est_a"), first(col("est_b")).as("est_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src_a"), col("src_b")).orderBy(col("h").asc)
    val agg = union.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_union"), max(col("h")).as("kth_u"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L))
          .as("n_common"),
        first(col("est_a")).as("est_a"), first(col("est_b")).as("est_b"))
    agg.select(col("src_a"), col("src_b"), col("n_common"), col("n_union"),
      round(col("n_common").cast("double") / col("n_union"), 6).as("j_est"),
      round(col("est_a"), 4).as("est_a"), round(col("est_b"), 4).as("est_b"),
      round(col("n_common").cast("double") / col("n_union") *
        est(col("n_union"), col("kth_u")) /
        least(col("est_a"), col("est_b")), 6).as("overlap_est"))
  }

  private def overlapImpl(corpus: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int, bloomFpp: Option[Double]): DataFrame = {
    val benchSet = benchmark
      .select(explode(TextExprs.wordShingles(text, n)).as("s"))
      .select(shingleKey(col("s")).as("sk"))
      .distinct()
      .withColumn("hit", lit(1))
    val corpusShingles = corpus
      .select(id.as("doc_id"), explode(TextExprs.wordShingles(text, n)).as("s"))
      .select(col("doc_id"), shingleKey(col("s")).as("sk"))
    val joined = bloomFpp match {
      case None =>
        corpusShingles.join(broadcast(benchSet), Seq("sk"), "left")
      case Some(fpp) =>
        // distinct count sizes the filter exactly; both jobs are
        // benchmark-side only (the small relation)
        val nDistinct = math.max(1L, benchSet.count())
        val bloom = benchSet.stat.bloomFilter(col("sk.h1"), nDistinct, fpp)
        val candidate =
          graft.functions.BloomProbe.mightContain(col("sk.h1"), bloom)
        // bloom survivors take the exact join; everything else flows
        // straight to the aggregate with hit = null (a LEFT join miss)
        corpusShingles.filter(candidate)
          .join(benchSet, Seq("sk"), "left")
          .unionByName(corpusShingles.filter(!candidate)
            .withColumn("hit", lit(null).cast("int")))
    }
    joined
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        (col("n_overlap") * 2 >= col("n_shingles")).as("contaminated"))
  }

  /** Fuzzy decontamination — document-level NEAR-duplicate matching
    * against the benchmark set (the decontamination regime of Llama /
    * FLAN-style dataset cards, complementing [[overlapVsBenchmark]]'s
    * GPT-3 shingle-overlap rule): corpus docs whose exact word-n-shingle
    * Jaccard against ANY benchmark doc reaches `threshold` are flagged,
    * with candidates generated by MinHash-LSH band collisions so the
    * corpus is never cross-joined with the benchmark. Returns one row
    * per FLAGGED corpus doc: `(doc_id, n_bench_hits, max_jaccard)`.
    *
    * At `bands`×`rowsPerBand` sized so P(miss | j ≥ threshold) ≈ 0 (16×2
    * at τ=0.8: 0.36¹⁶ ≈ 7·10⁻⁸), the output EQUALS the exact cross-set
    * Jaccard computation — which is therefore the oracle (q19's
    * contract, applied cross-set).
    *
    * Scale shape:
    *  - the benchmark is tiny vs the corpus: its band rows AND its
    *    shingle arrays broadcast; the corpus side is banded once
    *    (aggregation-barrier signature, one tokenize per doc — the
    *    [[NearDup.minhashBands]] contract) and candidates fall out of a
    *    broadcast hash join on `(band, bucket)`;
    *  - the verify pass re-joins shingle sets BY ID: candidates ×
    *    benchmark shingles broadcast back into one corpus scan, so
    *    corpus text never shuffles and non-candidate docs never reach
    *    the verify;
    *  - output is bounded by the contaminated set, not the corpus. */
  def fuzzyVsBenchmark(corpus: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int = 3, bands: Int = 16,
      rowsPerBand: Int = 2, threshold: Double = 0.8): DataFrame = {
    val cb = NearDup.minhashBands(corpus, id, text, n, bands, rowsPerBand)
      .select(col("band"), col("bucket"), col("id").as("doc_id"))
    val bb = NearDup.minhashBands(benchmark, id, text, n, bands, rowsPerBand)
      .select(col("band"), col("bucket"), col("id").as("bench_id"))
    val cand = cb.join(broadcast(bb), Seq("band", "bucket"))
      .select(col("doc_id"), col("bench_id"))
      .distinct()
    val bSh = benchmark.select(id.as("bench_id"),
      TextExprs.wordShingles(text, n).as("sh_b"))
    val candB = cand.join(broadcast(bSh), Seq("bench_id"))
    val cSh = corpus.select(id.as("doc_id"),
      TextExprs.wordShingles(text, n).as("sh_c"))
    cSh.join(broadcast(candB), Seq("doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_c"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_c"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bench_hits"),
        round(max(col("jaccard")), 6).as("max_jaccard"))
  }

  /** Per-source contamination rollup — the datasheet panel that decides
    * WHICH feed is leaking eval data (a 0.1% global rate hiding a 40%
    * rate in one source is the case that matters). `contam` is any
    * per-doc overlap table shaped like [[overlapVsBenchmark]]'s output
    * (id, n_shingles, n_overlap, contaminated); `sources` maps id →
    * source. Per source: doc counts, contaminated-doc rate, and the
    * micro-averaged gram overlap share Σoverlap/Σshingles — exact long
    * sums with ONE division each at the end (no per-doc float fractions
    * to sum, so the result is order-free and cross-engine exact).
    *
    * Scale: the contamination table is id-keyed metadata (no text); one
    * id join against the (id, source) projection, then a sources-bounded
    * aggregate. */
  def rateBySource(contam: DataFrame, sources: DataFrame): DataFrame =
    contam.join(sources, Seq("id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("contaminated").cast("long")).as("n_contaminated"),
        sum(col("n_shingles")).as("n_shingles"),
        sum(col("n_overlap")).as("n_overlap"))
      .select(col("source"), col("n_docs"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") /
          col("n_docs").cast("double"), 6).as("contam_rate"),
        col("n_shingles"), col("n_overlap"),
        round(col("n_overlap").cast("double") /
          col("n_shingles").cast("double"), 6).as("overlap_share"))
}
