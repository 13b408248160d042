package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashKernels, TextExprs}

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * score every raw-pool document by how much more likely its hashed
  * n-gram features are under a small TARGET distribution (the domain you
  * want more of) than under the raw pool itself. The per-doc log
  * importance weight is
  *
  *   logw(d) = Σ_{gram g ∈ d} ln( p_target(bucket(g)) / p_raw(bucket(g)) )
  *
  * with unigram+bigram features hashed into `buckets` buckets and add-1
  * smoothing on both bucket distributions — the bag-of-hashed-ngrams
  * model of the paper. Docs favored by the target score positive;
  * selection is then a filter/sample on the weight column.
  *
  * Scale shape:
  *  - both bucket-count tables are ≤ `buckets` rows (the whole point of
  *    feature hashing): they shuffle O(buckets), never O(corpus), and
  *    the merged log-ratio table BROADCASTS into the scoring pass;
  *  - scoring is one map-side gram explode over the raw pool + a
  *    broadcast join + a map-combined per-doc sum — raw text never
  *    shuffles, per-doc traffic is (id, partial sum);
  *  - the bucket hash is the oracle-portable polynomial fold
  *    ([[graft.functions.HashKernels.polyHash]], q87's replay
  *    discipline), so every bucket assignment — and thus every count,
  *    ratio, and weight — is reproducible by a relational oracle.
  */
object Dsir {

  private val polyMult = 31L
  private val polyMod = 2147483647L

  /** Hashed feature bucket of a gram string: portable poly fold mod
    * `buckets` (the fold is non-negative, so `%` == pmod). */
  private def bucket(gram: Column, buckets: Int): Column =
    HashKernels.polyHash(gram, polyMult, polyMod) % buckets

  /** `(doc_id, b)` — one row per gram occurrence of each doc, for every
    * n in `ns` (slide semantics: occurrences, not the distinct set). */
  private def gramBuckets(docs: DataFrame, id: Column, text: Column,
                          buckets: Int, ns: Seq[Int]): DataFrame = {
    val base = docs.select(id.as("doc_id"), TextExprs.tokens(text).as("ts"))
    val allGrams = ns.map(n => Diversity.slideGrams(col("ts"), n))
      .reduce(concat(_, _))
    base.select(col("doc_id"), explode(allGrams).as("g"))
      .select(col("doc_id"), bucket(col("g"), buckets).as("b"))
  }

  /** Per raw-pool doc: `(doc_id, n_grams, logw, selected)` where `logw`
    * is the rounded(4) importance weight and `selected = logw > 0`
    * (favored by the target). Docs with no grams keep a row with
    * `n_grams = 0, logw = 0.0, selected = false`. */
  def importanceWeights(raw: DataFrame, target: DataFrame, id: Column,
                        text: Column, buckets: Int,
                        ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    require(buckets >= 2, s"need >= 2 hash buckets, got $buckets")
    require(ns.nonEmpty && ns.forall(_ >= 1), s"need ns >= 1, got $ns")
    val tb = gramBuckets(target, id, text, buckets, ns)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rb = gramBuckets(raw, id, text, buckets, ns)
      .groupBy(col("b")).agg(count(lit(1)).as("cr"))
    // one-row totals ride the (≤ buckets)-row table as literal-like
    // cols; both cross joins carry the broadcast hint — the explicit
    // statement (enforced by graft.plans.ScaleGuard) that the joined
    // side is 1-row-bounded, not a size-estimate accident
    val totals = tb.agg(sum(col("ct")).as("nt"))
      .crossJoin(broadcast(rb.agg(sum(col("cr")).as("nr"))))
    // add-1 smoothing over the bucket space; the exact IEEE sequence
    // (two divisions, one division, one ln) is mirrored in the oracle
    val lr = tb.join(rb, Seq("b"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        log(((coalesce(col("ct"), lit(0L)) + 1.0) / (col("nt") + buckets)) /
          ((coalesce(col("cr"), lit(0L)) + 1.0) / (col("nr") + buckets)))
          .as("lr"))
    val scored = gramBuckets(raw, id, text, buckets, ns)
      .join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), round(sum(col("lr")), 4).as("logw"))
    raw.select(id.as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("logw"), lit(0.0)).as("logw"))
      .withColumn("selected", col("logw") > 0.0)
  }

  /** The RESAMPLING step of DSIR (Xie et al. 2023 §2): importance
    * weights become an actual selected subset via Gumbel top-k — key =
    * logw + Gumbel(0,1), take the k largest per group. Sampling without
    * replacement proportional-to-softmax(logw), exactly the paper's
    * sampler, but with the Gumbel noise derived from the doc's own
    * oracle-portable fingerprint (u = (poly(text) mod p + 0.5)/p,
    * g = −ln(−ln u)) so the draw is deterministic and replayable by a
    * relational oracle — no RNG state anywhere in the plan.
    *
    * Output: `(src, rank, doc_id, key)` — k rows per group, ranked by
    * the 1e-9-snapped key (exact-Long ranking, the established
    * cross-engine tie discipline), tie-broken by doc_id.
    *
    * Scale shape: weights cost what [[importanceWeights]] costs (bucket
    * count tables + one map-side score pass); the perturbed key is
    * map-side arithmetic; per-group top-k is a group-partitioned window
    * whose rank filter prunes map-side (WindowGroupLimit), so the
    * shuffle carries k-bounded traffic per group, never the pool.
    */
  def gumbelTopK(raw: DataFrame, target: DataFrame, id: Column,
                 text: Column, src: Column, buckets: Int,
                 k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val p = 999983L // largest prime below 1e6: u is never 0 or 1
    val w = importanceWeights(raw, target, id, text, buckets)
    // empty docs carry no fingerprint entropy (and no grams): excluded
    // from the draw on both engines
    val pool = raw.where(length(text) > 0)
      .select(id.as("doc_id"), src.as("src"),
        HashKernels.polyHash(text, 31L, 1000000007L).as("h"))
    val u = (pmod(col("h"), lit(p)).cast("double") + 0.5) / p.toDouble
    val keyed = pool.join(w, Seq("doc_id"))
      .select(col("doc_id"), col("src"),
        round((col("logw") - log(-log(u))) * 1e9).cast("long").as("key_e9"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
      .orderBy(col("key_e9").desc, col("doc_id").asc)
    keyed.withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select(col("src"), col("rank").cast("int").as("rank"),
        col("doc_id"),
        round(col("key_e9").cast("double") / 1e9, 6).as("key"))
  }
}
