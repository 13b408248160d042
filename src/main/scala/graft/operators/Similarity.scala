package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.10 similarity search).
  *
  *  - `bruteForceTopK` is the exact baseline: broadcast the (small) query set
  *    against the corpus, score every pair, window-top-k. One pass over the
  *    corpus, no corpus-side shuffle besides the final top-k — at 100 TB the
  *    corpus scan dominates and parallelizes linearly.
  *  - `ivfTopK` is the scale path: k-means-style coarse quantization via
  *    random-hyperplane LSH buckets (cheap, deterministic, no training step
  *    needed for a demo engine); queries probe only their own bucket(s).
  */
object Similarity {

  /** Per-pair cosine from per-row precomputed norms: the join materializes
    * each side's norm once (broadcast/shuffle barrier), so an N×M scoring
    * pass does one dot product per pair instead of three. `sqrt(n2a) *
    * sqrt(n2b)` (not `sqrt(n2a*n2b)`) keeps the exact IEEE op sequence of
    * the naive formula, so results are bit-identical with the oracle. */
  private def pairCosine(qv: Column, cv: Column, qn2: Column, cn2: Column): Column = {
    val den = sqrt(qn2) * sqrt(cn2)
    when(den === 0.0, lit(null).cast("double"))
      .otherwise(VectorExprs.dot(qv, cv) / den)
  }

  /** Exact cosine top-k: for each query vector, the k most similar corpus
    * vectors (excluding itself). Queries are broadcast — they must be small. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      VectorExprs.norm2(col(vec)).as("qn2"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      VectorExprs.norm2(col(vec)).as("cn2"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        pairCosine(col("qv"), col("cv"), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** IVF-style ANN: corpus is pre-bucketed by LSH; each query probes only its
    * bucket. Trades recall for a ~2^bits reduction in scored pairs. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              k: Int, dim: Int, bits: Int, seed: Long): DataFrame = {
    val bucket = (v: Column) => VectorExprs.lshBucket(v, dim, bits, seed)
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      bucket(col(vec)).as("bucket"), VectorExprs.norm2(col(vec)).as("cn2"))
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      bucket(col(vec)).as("bucket"), VectorExprs.norm2(col(vec)).as("qn2"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        pairCosine(col("qv"), col("cv"), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }
}
