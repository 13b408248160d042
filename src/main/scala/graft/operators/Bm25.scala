package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** BM25 (Okapi) top-k retrieval over a document corpus for a fixed set of
  * term queries — the lexical-retrieval primitive of a training-data
  * pipeline (benchmark decontamination lookups, quality-by-query probes,
  * seed-document expansion). Generalizes `TfIdf` (q47) with the standard
  * document-length normalization and the Robertson idf.
  *
  * score(D, Q) = Σ_{t∈Q} ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
  *               · tf · (k1+1) / (tf + k1·((1-b) + b·(dl/avgdl)))
  *
  * Determinism/oracle discipline: the query terms are plan-time literals,
  * so each query's score is ONE fixed-order scalar expression per doc
  * (left-to-right sum over its term list — no floating-point reduction
  * whose order the shuffle could change), and every corpus statistic the
  * formula reads (N, avgdl, per-term df) comes from a single conditional
  * aggregation row. An oracle can replay the identical IEEE op sequence.
  *
  * Scale shape:
  *  - ONE pass over the corpus computes N, Σdl, and every df_t as
  *    map-combinable conditional sums — no explode, no per-term scan;
  *  - the one-row stats frame is broadcast onto the corpus scan
  *    (`crossJoin(broadcast(...))`), so scoring is pure map-side work;
  *  - per-query top-k goes through `row_number` over (score desc, id) —
  *    Spark's WindowGroupLimit prunes to k rows per partition map-side
  *    before the single final shuffle.
  */
object Bm25 {

  /** Top-`k` docs per query. `queries` = (query_id, terms); ties break on
    * ascending doc id. Returns (query_id, rank, doc_id, score) with score
    * rounded to 4 decimals (also the ranking key, pre-tie-break, so the
    * output order is reproducible by any engine that matches the 4-decimal
    * score). */
  def topK(docs: DataFrame, id: Column, text: Column,
           queries: Seq[(String, Seq[String])],
           k1: Double = 1.2, b: Double = 0.75, k: Int = 5): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val terms = queries.flatMap(_._2).distinct
    val base = docs.select(id.as("doc_id"), TextExprs.tokens(text).as("ts"))
      .select(col("doc_id"), col("ts"), size(col("ts")).as("dl"))
    // one conditional-aggregation row: N, Σdl, df per distinct term
    val statAggs =
      count(lit(1)).as("n_docs") +:
      sum(col("dl").cast("long")).as("sum_dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("ts"), t), 1L).otherwise(0L)).as(s"df_$i")
      }
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val dfIdx = terms.zipWithIndex.toMap
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    def contrib(t: String): Column = {
      val dfD = col(s"df_${dfIdx(t)}").cast("double")
      val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
      val tf = size(filter(col("ts"), x => x === t)).cast("double")
      idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))))
    }
    val scored = base.crossJoin(broadcast(stats))
    // all queries in ONE corpus scan: a per-query (query_id, score) struct
    // array, exploded — each score a fixed left-assoc sum over its terms
    val qStructs = queries.map { case (qid, ts) =>
      struct(lit(qid).as("query_id"),
        round(ts.map(contrib).reduceLeft(_ + _), 4).as("score"))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .select(col("doc_id"), explode(array(qStructs: _*)).as("q"))
      .select(col("q.query_id").as("query_id"), col("doc_id"),
        col("q.score").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Ponte & Croft
    * 1998; Zhai & Lafferty 2001) — the language-modeling member of the
    * lexical trio (BM25 [[topK]], RM3 [[rm3TopK]]): each document is a
    * unigram LM smoothed toward the collection model, scored by the
    * query's log-likelihood
    *
    *   score(D, Q) = Σ_{t∈Q} ln( (tf_tD + μ·cf_t/|C|) / (dl_D + μ) )
    *
    * Query terms absent from the ENTIRE collection (cf_t = 0) contribute
    * nothing (the standard drop — with cf = 0 the smoothed probability
    * is 0 for every document and the term carries no ranking signal).
    *
    * Same determinism regime as [[topK]] (literal-term chains, not
    * data-driven sums): each query's score is ONE fixed-order scalar
    * expression per doc, and every collection statistic (|C|, per-term
    * cf) comes from a single conditional-aggregation row — the oracle
    * replays the identical IEEE op sequence. Same scale shape too: ONE
    * corpus pass for the stats (map-combinable conditional sums, no
    * explode), the one-row stats frame broadcast onto the scan, scoring
    * pure map-side, per-query top-k pruned map-side by WindowGroupLimit.
    */
  def qlTopK(docs: DataFrame, id: Column, text: Column,
             queries: Seq[(String, Seq[String])],
             mu: Double = 2000.0, k: Int = 5): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    require(mu > 0, s"mu must be positive, got $mu")
    val terms = queries.flatMap(_._2).distinct
    val base = docs.select(id.as("doc_id"), TextExprs.tokens(text).as("ts"))
      .select(col("doc_id"), col("ts"), size(col("ts")).as("dl"))
    // one conditional-aggregation row: |C| and cf per distinct term
    val statAggs =
      sum(col("dl").cast("long")).as("sum_dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(size(filter(col("ts"), x => x === t)).cast("long"))
          .as(s"cf_$i")
      }
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val cfIdx = terms.zipWithIndex.toMap
    def contrib(t: String): Column = {
      val cfD = col(s"cf_${cfIdx(t)}").cast("double")
      val tf = size(filter(col("ts"), x => x === t)).cast("double")
      when(cfD > 0,
        log((tf + lit(mu) * (cfD / col("sum_dl").cast("double"))) /
          (col("dl").cast("double") + lit(mu))))
        .otherwise(lit(0.0))
    }
    val scored = base.crossJoin(broadcast(stats))
    val qStructs = queries.map { case (qid, ts) =>
      struct(lit(qid).as("query_id"),
        round(ts.map(contrib).reduceLeft(_ + _), 4).as("score"))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .select(col("doc_id"), explode(array(qStructs: _*)).as("q"))
      .select(col("q.query_id").as("query_id"), col("doc_id"),
        col("q.score").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft 2001; the Jaleel et
    * al. 2004 RM3 interpolation) — the query-EXPANSION step the lexical
    * stack lacks: retrieve once, mine the top `fbDocs` documents' term
    * distribution for the vocabulary the original query missed, and
    * rescore with the interpolated weighted query
    *
    *   w(t) = α · wO(t) + (1−α) · wE(t)
    *
    * where `wO` spreads uniformly over the original terms and `wE` is
    * the normalized RM1 relevance model `Σ_d w_d · tf(t,d)/dl_d` over
    * the feedback docs (w_d = the doc's share of its query's feedback
    * score mass; zero-score feedback rows are dropped, so a query with
    * no positive feedback degrades to pure α-weighted original terms).
    * The second pass is a WEIGHTED BM25: each (query, term) weight
    * multiplies the standard idf·tf saturation contribution.
    *
    * Determinism (this operator's scores are DATA-DRIVEN sums, unlike
    * [[topK]]'s literal-term chains, so the dsum discipline applies):
    * feedback scores sum in DECIMAL(18,4) (they arrive 4-rounded);
    * every cross-row float sum — RM1 terms and final per-doc scores —
    * snaps each term to a 1e-9 fixed-point Long FIRST, so aggregation
    * is exact integer arithmetic and the final ranking key
    * (`score_e9`, exact Long) is engine-independent; expansion-term
    * selection ranks the exact `rm1_e9` Longs.
    *
    * Scale shape: pass 1 is [[topK]] (one corpus scan); the feedback
    * join, RM1 table, expansion selection, and the combined
    * (query, term, weight) table are queries×terms METADATA riding
    * broadcasts; the rescore explodes corpus tokens, semi-filters them
    * against the broadcast term set map-side (only matching-term rows
    * ever shuffle), aggregates (doc, term) tf, and joins the broadcast
    * weight×df table — the corpus never shuffles at row grain. One df
    * pass for expansion terms (distinct-token explode, same broadcast
    * filter). Output: `(query_id, rank, doc_id, score)` with score =
    * round(score_e9 / 1e9, 6). */
  def rm3TopK(docs: DataFrame, id: Column, text: Column,
              queries: Seq[(String, Seq[String])],
              k1: Double = 1.2, b: Double = 0.75, fbDocs: Int = 3,
              fbTerms: Int = 5, alpha: Double = 0.6, k: Int = 5)
      : DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1 && k >= 1,
      s"bad fbDocs=$fbDocs fbTerms=$fbTerms k=$k")
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1]: $alpha")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(id.as("doc_id"), TextExprs.tokens(text).as("ts"))
      .select(col("doc_id"), col("ts"), size(col("ts")).as("dl"))
    // pass 1: feedback docs (positive-score rows only)
    val fb = topK(docs, id, text, queries, k1, b, fbDocs)
      .filter(col("score") > 0)
    val fbTot = fb.groupBy(col("query_id"))
      .agg(sum(col("score").cast("decimal(18,4)")).as("tot"))
    val fbw = fb.join(broadcast(fbTot), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        (col("score").cast("double") / col("tot").cast("double")).as("w_d"))
    // RM1 over the feedback docs' tokens: snap each w_d·tf/dl to 1e-9
    val fbToks = base.join(broadcast(fbw), Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("w_d"), col("dl"),
        explode(col("ts")).as("t"))
      .groupBy(col("query_id"), col("doc_id"), col("w_d"), col("dl"),
        col("t"))
      .agg(count(lit(1)).as("tf"))
    val rm1 = fbToks
      .select(col("query_id"), col("t"),
        round(col("w_d") * col("tf").cast("double") /
          col("dl").cast("double") * 1e9).cast("long").as("e9"))
      .groupBy(col("query_id"), col("t"))
      .agg(sum(col("e9")).as("rm1_e9"))
      .filter(col("rm1_e9") > 0)
    val wSel = Window.partitionBy(col("query_id"))
      .orderBy(col("rm1_e9").desc, col("t").asc)
    val sel = rm1.withColumn("r", row_number().over(wSel))
      .filter(col("r") <= fbTerms)
    val selTot = sel.groupBy(col("query_id"))
      .agg(sum(col("rm1_e9")).as("sel_tot"))
    val expansion = sel.join(broadcast(selTot), Seq("query_id"))
      .select(col("query_id"), col("t"),
        (lit(1.0 - alpha) * col("rm1_e9").cast("double") /
          col("sel_tot").cast("double")).as("w"))
    val orig = queries.flatMap { case (qid, ts) =>
      val u = alpha / ts.distinct.size
      ts.distinct.map(t => (qid, t, u))
    }.toDF("query_id", "t", "w")
    val combined = orig.unionByName(expansion)
      .groupBy(col("query_id"), col("t")).agg(sum(col("w")).as("w"))
    // df + stats for every combined term (data-driven — one filtered
    // distinct-token pass)
    val termSet = combined.select(col("t")).distinct()
    val dfTab = base
      .select(col("doc_id"), explode(array_distinct(col("ts"))).as("t"))
      .join(broadcast(termSet), Seq("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"))
    // weighted rescore: explode, broadcast-filter, per-(doc, term) tf,
    // snap each weighted contribution, exact Long ranking key
    val tfTab = base
      .select(col("doc_id"), col("dl"), explode(col("ts")).as("t"))
      .join(broadcast(termSet), Seq("t"))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    val idf = log((nD - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfD = col("tf").cast("double")
    val sat = (tfD * lit(k1 + 1.0)) / (tfD + lit(k1) *
      (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val contrib = tfTab
      .join(broadcast(combined.join(dfTab, Seq("t"))), Seq("t"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(col("w") * idf * sat * 1e9).cast("long").as("e9"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("score_e9").desc, col("doc_id").asc)
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("e9")).as("score_e9"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score_e9").cast("double") / 1e9, 6).as("score"))
  }
}
