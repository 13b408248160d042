package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashKernels, TextExprs}

/** Hashed linear text classification (§2.10 extension surface) — the
  * inference step of a fastText-style quality/domain filter (Joulin et
  * al. 2016; the classifier family CCNet-style pipelines use to score
  * crawl text): hash each token into D buckets, average the bucket
  * weights, add a bias, squash with a sigmoid.
  *
  * The model is plan-time literals (weight array + bias), so scoring is
  * pure map-side arithmetic: token explode → bucket via the codegen'd
  * portable hash → literal-array weight lookup → per-doc aggregate. No
  * join, no shuffle beyond the per-doc combine. Weight sums accumulate
  * in decimal (exact, associative — the repo's dsum discipline) so the
  * score is independent of row order and engine; the single sigmoid exp
  * is absorbed by round(…, 4).
  *
  * At 100 TB this is the shape a learned filter must have: the model
  * rides the plan (broadcast-free — it IS the code), the corpus never
  * shuffles, and a D of a few hundred thousand stays comfortably inside
  * a literal array. */
object Classify {

  private val P = 1000000007L

  /** Per-doc classifier scores: `(id, n_toks, score)` with
    * `score = round(sigmoid(bias + mean(w[hash(tok) mod D])), 4)`.
    * `weights(i)` must be exactly representable at the declared decimal
    * scale (pass values rounded to ≤ 12 decimals); docs with no tokens
    * are excluded (no features → no score, the caller decides a prior). */
  def hashedLinearScore(df: DataFrame, id: Column, text: Column,
      weights: Seq[Double], bias: Double): DataFrame = {
    require(weights.nonEmpty, "need at least one weight bucket")
    val d = weights.length
    val wArr = array(weights.map(w => lit(w).cast("decimal(28,12)")): _*)
    df.select(id.as("id"), explode(TextExprs.tokens(text)).as("tok"))
      .select(col("id"),
        element_at(wArr,
          pmod(HashKernels.polyHash(col("tok"), 31L, P), lit(d.toLong))
            .cast("int") + 1).as("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("zsum"))
      .select(col("id"), col("n_toks"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(bias) + (col("zsum").cast("double") /
            col("n_toks").cast("double"))))), 4).as("score"))
  }
}
