package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion (§2.10 extension surface): combine a
  * lexical ranking (BM25) and a semantic ranking (embedding cosine) of
  * the same corpus into one list per query with reciprocal-rank fusion
  * (Cormack, Clarke & Buettcher 2009) — the standard "hybrid search"
  * aggregation retrieval stacks use because it needs no score
  * calibration between arms, only ranks.
  *
  * Determinism: the textbook Σ 1/(c+rank) is a float sum whose value
  * would depend on aggregation order. Here each arm's contribution is
  * the INTEGER `1e12 div (c+rank)` — exact fixed-point, associative,
  * engine-portable — so the fused score (and therefore the output
  * ranking, tie-broken on ascending doc id) is a pure function of the
  * input ranks that any engine replays bit-for-bit.
  *
  * Scale shape: the fusion input is arms × queries × k rows — metadata
  * relative to the corpus; all heavy lifting (the corpus scans) lives in
  * the retrieval arms, which keep their own 100 TB shapes ([[Bm25]]:
  * one conditional-aggregation stats row broadcast onto one corpus scan;
  * [[Similarity.bruteForceTopK]]: broadcast queries, map-side scoring,
  * WindowGroupLimit top-k). The fuse itself is one tiny hash aggregate
  * plus a WindowGroupLimit-pruned rank — sub-second at any corpus size.
  */
object Retrieval {

  private val Scale = 1000000000000L // 1e12: rrf fixed-point denominator

  /** Fuse per-query rankings with RRF. Every input must have columns
    * `(query_id, rank, doc_id)`; ranks are 1-based positions from that
    * arm's top-k (absent docs simply contribute nothing). Returns the
    * top `k` per query as `(query_id, rank, doc_id, rrf_e12)` where
    * `rrf_e12 = Σ_arms (1e12 div (c + arm_rank))` — the RRF score in
    * 1e-12 units. Ordering: `rrf_e12` desc, `doc_id` asc (total order).
    */
  def rrfFuse(rankings: Seq[DataFrame], c: Int = 60, k: Int = 10)
      : DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(c >= 0, s"rrf constant must be >= 0, got $c")
    // `div` is Long integer division (Spark's `/` on longs is a double
    // divide — the one thing this operator must avoid)
    val arms = rankings.map(_.select(col("query_id"), col("doc_id"),
      call_function("div", lit(Scale),
        lit(c.toLong) + col("rank").cast("long")).as("contrib")))
    val fused = arms.reduce(_.unionAll(_))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_e12"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_e12").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_e12"))
  }
}
