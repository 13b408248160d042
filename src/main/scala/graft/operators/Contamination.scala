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
      id: Column, text: Column, n: Int = 3): DataFrame = {
    val benchSet = benchmark
      .select(explode(TextExprs.wordShingles(text, n)).as("s"))
      .select(shingleKey(col("s")).as("sk"))
      .distinct()
      .withColumn("hit", lit(1))
    corpus
      .select(id.as("doc_id"), explode(TextExprs.wordShingles(text, n)).as("s"))
      .select(col("doc_id"), shingleKey(col("s")).as("sk"))
      .join(broadcast(benchSet), Seq("sk"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        (col("n_overlap") * 2 >= col("n_shingles")).as("contaminated"))
  }
}
