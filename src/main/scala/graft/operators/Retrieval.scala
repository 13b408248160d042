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

  /** nDCG@k of a ranking against graded relevance judgments — the
    * retrieval-eval companion of the classifier metrics (q136–q144):
    * `DCG@k = Σ_{i≤k} (2^rel_i − 1)/log2(i+1)` over the ranking's
    * positions, normalized by the ideal DCG (judgments re-sorted by
    * grade). `ranked` must carry `(query_id, rank, doc_id)` (any arm's
    * top-k: BM25, cosine, RRF); `qrels` carries `(query_id, doc_id,
    * rel)` with integer grades ≥ 0.
    *
    * Determinism: each position's gain term is transcendental (log2),
    * so it snaps to 1e-9 fixed-point BIGINT per row BEFORE any sum —
    * the sums are then exact integer aggregates (partition-order-free,
    * engine-replayable: the q72/unigram discipline), and the final
    * normalization is one integer-to-double division snapped to 6.
    * Queries with no positive judgments yield null ndcg (0/0).
    *
    * Scale shape: both inputs are METADATA (queries × k and the judged
    * pairs) — the corpus scans live in the arms that produced them.
    * Windows partition by query_id; everything else is hash aggregates
    * over bounded tables. */
  def ndcgAtK(ranked: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def termE9(rel: org.apache.spark.sql.Column,
               pos: org.apache.spark.sql.Column) =
      round((pow(lit(2.0), rel.cast("double")) - 1.0) /
        log2(pos.cast("double") + 1.0) * 1e9).cast("long")
    val r = ranked.filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
      .join(qrels.select(col("query_id"), col("doc_id"),
        col("rel").cast("int").as("rel")), Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val dcg = r.groupBy(col("query_id"))
      .agg(sum(termE9(col("rel"), col("rank"))).as("dcg_e9"))
    val wI = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    val ideal = qrels.select(col("query_id"), col("doc_id"),
        col("rel").cast("int").as("rel"))
      .filter(col("rel") > 0)
      .withColumn("irank", row_number().over(wI))
      .filter(col("irank") <= k)
    val idcg = ideal.groupBy(col("query_id"))
      .agg(sum(termE9(col("rel"), col("irank"))).as("idcg_e9"))
    ranked.select(col("query_id")).distinct()
      .join(dcg, Seq("query_id"), "left")
      .join(idcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg_e9"), lit(0L)).as("dcg_e9"),
        coalesce(col("idcg_e9"), lit(0L)).as("idcg_e9"),
        when(col("idcg_e9") > 0,
          round(coalesce(col("dcg_e9"), lit(0L)).cast("double") /
            col("idcg_e9").cast("double"), 6)).as("ndcg"))
  }

  /** Reciprocal rank @k per query (their mean is MRR — left to the
    * caller so the per-query table stays oracle-friendly): `1/rank` of
    * the FIRST relevant result in the top k, 0 when none is. Exact
    * rational → one division snapped to 6; inputs as in [[ndcgAtK]]
    * (any `rel > 0` counts as relevant). */
  def reciprocalRankAtK(ranked: DataFrame, qrels: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hit = ranked.filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
      .join(qrels.filter(col("rel").cast("int") > 0)
        .select(col("query_id"), col("doc_id")), Seq("query_id", "doc_id"))
      .groupBy(col("query_id")).agg(min(col("rank")).as("first_rel_rank"))
    ranked.select(col("query_id")).distinct()
      .join(hit, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rel_rank"),
        coalesce(round(lit(1.0) / col("first_rel_rank").cast("double"), 6),
          lit(0.0)).as("rr"))
  }
}
