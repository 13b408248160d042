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
}
