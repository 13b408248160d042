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
}
