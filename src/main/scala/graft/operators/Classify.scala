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

  /** Full-batch gradient-descent TRAINING of the hashed logistic
    * classifier [[hashedLinearScore]] serves — the learn step of a
    * CCNet/fastText-style quality or language filter, run where the
    * labels are: on the cluster, against the full corpus.
    *
    * Determinism across engines and partitionings, the part a naive
    * float implementation gets wrong:
    *  - per-doc features are bucket counts `c_j` (exact integers,
    *    map-side HOFs over the token array — no shuffle, no explode);
    *  - the per-doc logit numerator `Σ_j w_j·c_j` is a FIXED-ORDER
    *    left-associated double sum over the structural bucket index —
    *    order is part of the operator, not of the data layout;
    *  - each doc's gradient contribution is snapped to 1e-8 fixed-point
    *    (`round(x·1e8)` → BIGINT), so the cross-doc gradient sum is an
    *    exact integer aggregate — associative, partition-order-free,
    *    and replayable bit-for-bit by any engine;
    *  - the weight update `w_j − lr·((g_j/1e8)/N)` is then a fixed
    *    sequence of IEEE double ops on engine-identical inputs.
    *
    * Scale shape: one map-side featurize + ONE metadata-sized global
    * aggregate (dim+2 longs, partial-agg combined) per iteration — the
    * corpus never shuffles; the model lives in the plan as literals
    * (same regime as [[Vocab]]'s driver-delta BPE trainer). Docs with
    * no tokens carry no features and are excluded. `dim` is bounded by
    * literal-array limits (a few hundred thousand).
    */
  def trainLogReg(df: DataFrame, id: Column, text: Column, label: Column,
      dim: Int, lr: Double, iters: Int): DataFrame = {
    require(dim >= 1 && dim <= (1 << 20), s"dim out of range: $dim")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    val (w, b) = trainLogRegModel(df, id, text, label, dim, lr, iters)
    import spark.implicits._
    (Seq((-1, b)) ++ w.indices.map(j => (j, w(j))))
      .toDF("idx", "weight")
      .select(col("idx"), round(col("weight"), 9).as("weight"))
  }

  /** [[trainLogReg]]'s driver loop, returning the raw (weights, bias)
    * doubles for composition and specs. */
  def trainLogRegModel(df: DataFrame, id: Column, text: Column,
      label: Column, dim: Int, lr: Double, iters: Int)
      : (IndexedSeq[Double], Double) = {
    val feat = {
      val cols = col("id") +: col("y") +:
        size(col("ts")).cast("long").as("n") +:
        (0 until dim).map { j =>
          size(filter(col("ts"), t =>
            pmod(HashKernels.polyHash(t, 31L, P), lit(dim.toLong)) ===
              lit(j.toLong))).cast("long").as(s"c_$j")
        }
      df.select(id.as("id"), TextExprs.tokens(text).as("ts"),
          label.cast("int").as("y"))
        .filter(size(col("ts")) > 0)
        .select(cols: _*)
    }
    var w = IndexedSeq.fill(dim)(0.0)
    var b = 0.0
    var nDocs = -1L
    (0 until iters).foreach { _ =>
      val znum = (0 until dim).map(j => lit(w(j)) * col(s"c_$j").cast("double"))
        .reduceLeft(_ + _)
      val p = lit(1.0) / (lit(1.0) +
        exp(-(lit(b) + (znum / col("n").cast("double")))))
      val diff = p - col("y").cast("double")
      def snap(x: Column): Column = round(x * lit(1.0e8)).cast("long")
      val gradAggs = sum(snap(diff)).as("g_b") +:
        (0 until dim).map(j => sum(snap(
          (diff * col(s"c_$j").cast("double")) / col("n").cast("double")))
          .as(s"g_$j"))
      val row = feat.agg(count(lit(1)).as("n_docs"), gradAggs: _*).head()
      nDocs = row.getAs[Long]("n_docs")
      require(nDocs > 0, "trainLogReg: no docs with tokens")
      val n = nDocs.toDouble
      b = b - lr * ((row.getAs[Long]("g_b") / 1.0e8) / n)
      w = (0 until dim).map(j =>
        w(j) - lr * ((row.getAs[Long](s"g_$j") / 1.0e8) / n))
    }
    (w, b)
  }
}
