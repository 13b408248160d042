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
  private[operators] def pairCosine(qv: Column, cv: Column, qn2: Column,
      cn2: Column): Column = {
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

  /** Exact EUCLIDEAN top-k — the gold-standard baseline for the PQ/ADC
    * family, which ranks by (approximate) L2 distance, not cosine:
    * recall of an ADC arm against a cosine baseline would conflate
    * quantization error with metric mismatch. Same shape and contracts
    * as [[bruteForceTopK]]: queries broadcast, scoring map-side,
    * WindowGroupLimit prunes, ties on raw distance break ascending
    * neighbor id, output distance snapped to 6. */
  def bruteForceTopKL2(corpus: DataFrame, queries: DataFrame,
                       id: String, vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"),
      col(vec).cast("array<double>").as("qv"))
    val c = corpus.select(col(id).as("neighbor_id"),
      col(vec).cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("dist", VectorExprs.l2sq(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("dist"), 6).as("dist"))
  }

  /** Exact DOT-PRODUCT top-k — the gold-standard baseline for the SQ8
    * family, which ranks by the approximate inner product
    * `scale · Σ code_i · q_i` (maximum-inner-product search, not
    * cosine: no normalization). Same shape and contracts as
    * [[bruteForceTopK]]; output score snapped to 4 (the q99/q21 grain). */
  def bruteForceTopKDot(corpus: DataFrame, queries: DataFrame,
                        id: String, vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"),
      col(vec).cast("array<double>").as("qv"))
    val c = corpus.select(col(id).as("neighbor_id"),
      col(vec).cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", VectorExprs.dot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 4).as("score"))
  }

  /** k-NN majority-vote classification over a LABELED embedding corpus —
    * the semantic-filtering primitive of corpus curation (label a small
    * seed set "keep/drop" or by topic, classify the rest by embedding
    * neighborhood): for each query vector, the `k` nearest labeled
    * neighbors by cosine vote; the winner is `(query_id, pred_label,
    * votes)` with ties broken toward the smallest label (total order,
    * oracle-stable).
    *
    * Scale shape: identical to [[bruteForceTopK]] — queries broadcast,
    * scoring map-side on the codegen'd vector kernel, per-query rank
    * prunes map-side (WindowGroupLimit), and the vote aggregate runs over
    * queries × k rows, which is metadata-sized. The label column rides
    * the corpus scan; no extra join.
    *
    * `excludeSelf` (default true) drops pairs with `query_id ==
    * neighbor_id` — the leave-one-out contract for queries drawn FROM the
    * labeled corpus (q85's shape). It assumes query ids share the corpus
    * id space: for a DISJOINT query table whose ids are minted
    * independently, pass `excludeSelf = false`, or a legitimate nearest
    * neighbor that coincidentally shares an id is dropped and can flip a
    * small-k vote. */
  def knnClassify(labeled: DataFrame, queries: DataFrame, id: String,
      vec: String, label: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      VectorExprs.norm2(col(vec)).as("qn2"))
    val c = labeled.select(col(id).as("neighbor_id"), col(label).as("lab"),
      col(vec).as("cv"), VectorExprs.norm2(col(vec)).as("cn2"))
    val joinCond =
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)
    val scored = c.join(broadcast(q), joinCond)
      .withColumn("cos",
        pairCosine(col("qv"), col("cv"), col("qn2"), col("cn2")))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("lab").asc)
    scored.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .groupBy(col("query_id"), col("lab"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("__r", row_number().over(wVote))
      .filter(col("__r") === 1)
      .select(col("query_id"), col("lab").as("pred_label"), col("votes"))
  }

  /** Hard-negative mining for contrastive training (the DPR/SimCSE
    * retrieval recipe): for each query embedding, the `k` most-similar
    * corpus embeddings with a DIFFERENT label — maximally confusable
    * non-matches, the negatives that actually move a contrastive loss.
    * `maxCos` is the standard false-negative guard: a different-label row
    * whose cosine exceeds it is almost certainly a mislabeled duplicate of
    * the query (denoised hard-negative mining), so it is excluded BEFORE
    * ranking rather than served as a "negative".
    *
    * Scale shape: [[knnClassify]] verbatim — queries (with their labels)
    * broadcast, scoring map-side on the codegen'd dot kernel, per-query
    * rank pruned map-side by WindowGroupLimit; the label inequality and
    * maxCos guard are scan-side filters, so non-candidates never reach the
    * window. No extra join: the corpus label rides the scan. */
  def hardNegatives(labeled: DataFrame, queries: DataFrame, id: String,
      vec: String, label: String, k: Int,
      maxCos: Double = 0.995): DataFrame = {
    val q = queries.select(col(id).as("query_id"),
      col(label).as("query_label"), col(vec).as("qv"),
      VectorExprs.norm2(col(vec)).as("qn2"))
    val c = labeled.select(col(id).as("neighbor_id"),
      col(label).as("neighbor_label"), col(vec).as("cv"),
      VectorExprs.norm2(col(vec)).as("cn2"))
    val scored = c.join(broadcast(q),
        col("query_label") =!= col("neighbor_label"))
      .withColumn("cos",
        pairCosine(col("qv"), col("cv"), col("qn2"), col("cn2")))
      .filter(col("cos") <= maxCos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("rank"),
        col("neighbor_id"), col("neighbor_label"),
        round(col("cos"), 4).as("cos"))
  }

  /** IVF with a LEARNED coarse quantizer (k-means, MLlib) and multi-probe:
    * corpus rows are assigned to their nearest centroid once; each query
    * probes its `nProbe` nearest centroids, so recall degrades gracefully
    * (unlike single-bucket LSH). At scale the corpus partitioning by
    * centroid id is the shuffle key; the centroid table itself is tiny and
    * broadcast. Training uses MLlib's parallel k-means on the (sampled)
    * corpus — the model is dimension-scale driver state, like any IVF index. */
  /** Train the coarse quantizer on a BOUNDED sample of the corpus: k-means
    * over every row of a 100 TB corpus is an unbounded MLlib job before any
    * query runs, and centroid quality converges long before full-corpus
    * training. Assignment (done by the caller) still covers the full corpus.
    * Returns the model plus the actual training row count so tests can pin
    * the bound. */
  def fitQuantizer(corpusVec: DataFrame, nCentroids: Int, seed: Long,
                   maxTrainRows: Long): (org.apache.spark.ml.clustering.KMeansModel, Long) = {
    import org.apache.spark.ml.clustering.KMeans
    val n = corpusVec.count()
    val train =
      if (n <= maxTrainRows) corpusVec
      else corpusVec.sample(withReplacement = false,
        maxTrainRows.toDouble / n, seed)
    val cached = train.persist()
    try {
      val cnt = cached.count()
      val model = new KMeans().setK(nCentroids).setSeed(seed)
        .setFeaturesCol("features").fit(cached)
      (model, cnt)
    } finally cached.unpersist()
  }

  def ivfKmeansTopK(corpus: DataFrame, queries: DataFrame, id: String,
                    vec: String, k: Int, nCentroids: Int, nProbe: Int,
                    seed: Long, maxTrainRows: Long = 100000L): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector

    val corpusVec = corpus.select(col(id).as("neighbor_id"),
      col(vec).as("cv"), array_to_vector(col(vec)).as("features"))
    val (model, _) = fitQuantizer(corpusVec, nCentroids, seed, maxTrainRows)
    val assigned = model.transform(corpusVec)
      .select(col("neighbor_id"), col("cv"),
        col("prediction").as("centroid_id"),
        VectorExprs.norm2(col("cv")).as("cn2"))

    // tiny centroid relation (id, center as array<double>)
    val spark = corpus.sparkSession
    import spark.implicits._
    val centers = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq
      .toDF("centroid_id", "center")

    // each query probes its nProbe nearest centroids (L2 on the tiny table)
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      VectorExprs.norm2(col(vec)).as("qn2"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").asc, col("centroid_id").asc)
    val probes = q.crossJoin(broadcast(centers))
      .withColumn("cdist", VectorExprs.l2sq(col("qv"), col("center")))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn2"), col("centroid_id"))

    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
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

  /** IVF-style ANN: corpus is pre-bucketed by LSH; each query MULTI-PROBES
    * every bucket within `probeHamming` bit flips of its own (single-bucket
    * probing measured recall@5 ≈ 0.10 on near-uniform embeddings — an ANN
    * that misses 90% of true neighbors is a trap, so the probe ring is the
    * default). The corpus side still carries exactly one bucket per row, so
    * the probe expansion multiplies only the tiny broadcast query side. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              k: Int, dim: Int, bits: Int, seed: Long,
              probeHamming: Int = 1): DataFrame = {
    val bucket = (v: Column) => VectorExprs.lshBucket(v, dim, bits, seed)
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      bucket(col(vec)).as("bucket"), VectorExprs.norm2(col(vec)).as("cn2"))
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      bucket(col(vec)).as("qbucket"), VectorExprs.norm2(col(vec)).as("qn2"))
      .withColumn("bucket",
        explode(VectorExprs.probeBuckets(col("qbucket"), bits, probeHamming)))
      .drop("qbucket")
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

  /** The nprobe OPERATING CURVE of [[ivfTopK]]: recall@k against an exact
    * top-k ground truth AND candidate volume, one row per probe radius —
    * the two axes a serving deployment trades between (radius up: recall
    * up, scanned candidates up; the curve picks the operating point, and
    * re-measuring it per corpus snapshot catches recall rot when the
    * embedding distribution drifts — q141's single-point check widened to
    * the whole dial).
    *
    * `exact` is [[bruteForceTopK]]'s output for the same (corpus,
    * queries, k). Recall is micro-averaged — integer hit counts over
    * integer totals, ONE division per row (order-free, cross-engine
    * exact). Scale: each arm is the registered IVF plan (corpus bucketed
    * once per arm, queries broadcast); the recall join and count
    * aggregates are queries×k metadata; output is |radii| rows. */
  def ivfProbeSweep(corpus: DataFrame, queries: DataFrame, id: String,
                    vec: String, k: Int, dim: Int, bits: Int, seed: Long,
                    radii: Seq[Int], exact: DataFrame): DataFrame = {
    val ex = exact.select(col("query_id"), col("neighbor_id"))
    val arms = radii.map { r =>
      val approx = ivfTopK(corpus, queries, id, vec, k, dim, bits, seed, r)
        .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
      val hits = ex.join(approx,
          col("query_id") === col("aq") && col("neighbor_id") === col("an"),
          "left")
        .agg(count(lit(1)).as("n_exact"), count(col("an")).as("n_hit"))
      // candidate volume: the scored-join cardinality BEFORE top-k — the
      // per-poll cost the radius buys
      val bucket = (v: Column) => VectorExprs.lshBucket(v, dim, bits, seed)
      val c = corpus.select(col(id).as("neighbor_id"),
        bucket(col(vec)).as("bucket"))
      val q = queries.select(col(id).as("query_id"),
          bucket(col(vec)).as("qbucket"))
        .withColumn("bucket",
          explode(VectorExprs.probeBuckets(col("qbucket"), bits, r)))
      val cand = c.join(broadcast(q), Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .agg(count(lit(1)).as("n_cand"))
      hits.crossJoin(broadcast(cand))
        .select(lit(r).as("probe_hamming"), col("n_exact"), col("n_hit"),
          round(col("n_hit").cast("double") /
            col("n_exact").cast("double"), 6).as("recall"),
          col("n_cand"))
    }
    arms.reduce(_ unionByName _)
  }

  /** Embedding-level semantic dedup — the SemDeDup decision (Abbas et al.
    * 2023: cluster, then drop near-identical embeddings within a cluster),
    * with random-hyperplane LSH buckets as the clustering (deterministic,
    * training-free, and — unlike k-means — fully oracle-expressible, so
    * the EXACT semantics is checked, not a recall proxy). A vector is
    * DROPPED when some smaller-id vector in its bucket has cosine ≥
    * `threshold`; ties in an ε-ball thus resolve to the smallest id in
    * one pass (the standard non-iterative approximation — a dropped
    * vector can itself justify another drop, which only errs toward
    * dropping more of a tight cluster, never toward keeping a duplicate
    * pair). Returns every input id with a `kept` flag — stable row count,
    * so downstream joins and the oracle see the whole corpus.
    *
    * Scale shape: an exact-duplicate collapse runs FIRST — identical
    * vectors (128-bit content hash, the q9 trade) fold to their min-id
    * representative before any bucket join. This is semantics-preserving,
    * not an approximation: copies share the bucket and every cosine, so
    * (a) every non-min copy is dropped by its own family min, and (b) for
    * any other vector, a justifying smaller-id copy implies the family
    * min (smaller still) also justifies. Without the collapse, an
    * exact-duplicate flood (N copies of one boilerplate embedding — the
    * common real-corpus skew) puts N co-bucketed rows into the pair join
    * and the within-bucket quadratic term takes over; the ops8 probe
    * measured exactly that wall. After the collapse the pair join runs on
    * DISTINCT vectors only ([[NearDup.embeddingNearDupPairs]]: one bucket
    * shuffle, within-bucket pairing, expected population controlled by
    * `bits` — near-identical-but-unequal floods remain the operator's
    * documented residual skew risk). Total vector exchanges: the hash
    * partition (collapse window) + the bucket shuffle; decision traffic
    * back is ids-only. */
  def semanticDedup(embs: DataFrame, id: Column, vec: Column, dim: Int,
                    bits: Int, seed: Long, threshold: Double): DataFrame = {
    val keyed = embs.select(id.as("vec_id"), vec.as("__v"),
      xxhash64(vec).as("__h1"), xxhash64(vec, lit(1)).as("__h2"))
      .withColumn("__rep_id", min(col("vec_id"))
        .over(Window.partitionBy(col("__h1"), col("__h2"))))
    val reps = keyed.filter(col("vec_id") === col("__rep_id"))
      .select(col("vec_id"), col("__v"))
    val pairDrops = NearDup.embeddingNearDupPairs(reps, col("vec_id"),
        col("__v"), dim, bits, seed, threshold)
      .select(col("id_b").as("__drop_id")).distinct()
    keyed.join(pairDrops, col("vec_id") === col("__drop_id"), "left")
      .select(col("vec_id"),
        (col("vec_id") === col("__rep_id") && col("__drop_id").isNull)
          .as("kept"))
  }

  /** Deterministic Gaussian Johnson–Lindenstrauss projection matrix
    * (`dimOut` rows × `dimIn` cols), entries N(0,1)/√dimOut from a fixed
    * seed — a driver-side literal like [[VectorExprs.lshPlanes]], so the
    * exact projection is renderable into oracle SQL (Double.toString
    * round-trips). */
  def rpMatrix(dimIn: Int, dimOut: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(dimOut)(Seq.fill(dimIn)(rng.nextGaussian() / math.sqrt(dimOut)))
  }

  /** Deterministic random ORTHOGONAL `dim`×`dim` matrix: modified
    * Gram–Schmidt over seeded Gaussian rows (Haar-ish rotation — exact
    * uniformity would need the QR sign fix, irrelevant for balancing).
    * Driver-side pure arithmetic; the result rides query plans as
    * literals like [[rpMatrix]]. Rotating vectors by an orthogonal
    * matrix preserves all pairwise distances EXACTLY in real arithmetic,
    * which is what makes it the OPQ-lite pre-step for product
    * quantization: PQ's per-subspace distortion depends on how variance
    * spreads across the fixed coordinate cuts, and a random rotation
    * decorrelates/balances the subspaces (Jégou et al.'s random-rotation
    * baseline; OPQ learns the rotation, this ships the training-free
    * rung) without changing which neighbors are near. */
  def orthogonalMatrix(dim: Int, seed: Long): Seq[Seq[Double]] = {
    require(dim >= 1, s"orthogonalMatrix needs dim >= 1, got $dim")
    val rng = new scala.util.Random(seed)
    val rows = Array.fill(dim, dim)(rng.nextGaussian())
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        val d = (0 until dim).map(k => rows(i)(k) * rows(j)(k)).sum
        for (k <- 0 until dim) rows(i)(k) -= d * rows(j)(k)
      }
      val n = math.sqrt((0 until dim).map(k => rows(i)(k) * rows(i)(k)).sum)
      // dim iid Gaussian rows are almost surely independent; a degenerate
      // draw means the seed is pathological — fail loudly, don't emit a
      // non-orthogonal "rotation"
      require(n > 1e-9, s"degenerate Gram-Schmidt row $i (seed $seed)")
      for (k <- 0 until dim) rows(i)(k) /= n
    }
    rows.map(_.toIndexedSeq).toIndexedSeq
  }

  /** Project `v` through a literal matrix: `out[j] = dot(v, row_j)` —
    * `dimOut` codegen'd dot kernels, pure map-side. */
  def rpProject(v: Column, matrix: Seq[Seq[Double]]): Column =
    array(matrix.map(row =>
      VectorExprs.dot(v, array(row.map(lit): _*))): _*)

  /** Random-projection ANN: dimensionality reduction (JL) as the
    * candidate stage of a two-pass top-k. Pass 1 ranks the corpus per
    * query by cosine in the `dimOut`-dimensional PROJECTED space and
    * keeps `rerank` candidates; pass 2 re-scores only those candidates
    * with the exact full-dimension cosine and emits the top `k`
    * (`query_id, rank, neighbor_id, approx_cos, cos`).
    *
    * Scale shape — [[graft.operators.Quantize.bqTopK]]'s two-pass
    * contract with a float sketch instead of sign bits:
    *  - the projection is map-side (no shuffle; at 1024→64 dims the
    *    scan-side data volume drops 16×), queries' projections
    *    broadcast, and the candidate rank prunes map-side
    *    (WindowGroupLimit) carrying ids + one float;
    *  - pass 2 broadcast-semi-filters the corpus by the queries×rerank
    *    candidate set, so full-width vectors are read only for
    *    candidates.
    * The matrix is a plan literal, both cosines are the exact IEEE
    * sequence of [[bruteForceTopK]], so the oracle replays the REAL
    * two-pass semantics — candidate cut included, no recall proxy. */
  def rpTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
             matrix: Seq[Seq[Double]], k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must be >= k = $k")
    val c = corpus.select(col(id).as("neighbor_id"),
        rpProject(col(vec).cast("array<double>"), matrix).as("pc"))
      .select(col("neighbor_id"), col("pc"),
        VectorExprs.norm2(col("pc")).as("pcn2"))
    val q = queries.select(col(id).as("query_id"),
        rpProject(col(vec).cast("array<double>"), matrix).as("pq"))
      .select(col("query_id"), col("pq"),
        VectorExprs.norm2(col("pq")).as("pqn2"))
    val approx = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("approx_cos",
        pairCosine(col("pq"), col("pc"), col("pqn2"), col("pcn2")))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id").asc)
    val cand = approx.withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("neighbor_id"), col("approx_cos"))
    val qv = queries.select(col(id).as("query_id"),
      col(vec).cast("array<double>").as("qv"),
      VectorExprs.norm2(col(vec).cast("array<double>")).as("qn2"))
    val candQ = cand.join(qv, Seq("query_id"))
    val cv = corpus.select(col(id).as("neighbor_id"),
      col(vec).cast("array<double>").as("cv"),
      VectorExprs.norm2(col(vec).cast("array<double>")).as("cn2"))
    val scored = cv.join(broadcast(candQ), Seq("neighbor_id"))
      .withColumn("cos",
        pairCosine(col("qv"), col("cv"), col("qn2"), col("cn2")))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(wC))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("approx_cos"), 4).as("approx_cos"),
        round(col("cos"), 4).as("cos"))
  }

  /** Exact cosine top-k with NEITHER side broadcast — the block-
    * nested-loop shard plan for the regime where both the query set
    * and the corpus are too large to fit an executor (bitext mining:
    * both "sides" are corpora). Semantically identical to
    * [[bruteForceTopK]] (self-pairs excluded, ties on raw cosine break
    * ascending neighbor id, output cosine snapped to 4) — sharding is
    * an execution choice, not a semantics choice, so the two are
    * interchangeable under any oracle.
    *
    * Plan: queries hash into `queryShards` groups and replicate to
    * every corpus shard; corpus rows hash into `corpusShards` groups
    * and replicate to every query shard; ONE equi-join on the
    * `(qs, cs)` shard-pair key streams each block's cross product —
    * every (query, corpus) pair meets exactly once, at the key
    * `(hash(q) mod Qs, hash(c) mod Cs)`. Per-(query, corpus-shard)
    * top-k prunes map-side (WindowGroupLimit), so only
    * `|Q| · corpusShards · k` candidate rows reach the merge window;
    * the per-shard k-lists merge associatively (the global top-k of a
    * union is the top-k of the per-part top-k's — the tie total-order
    * makes the merge exact, not just size-correct).
    *
    * Cost model (the BNL trade): each query row is copied
    * `corpusShards` times and each corpus row `queryShards` times —
    * replication buys executor-bounded blocks of
    * `|Q|/Qs × |C|/Cs` pairs that stream through codegen without any
    * O(|side|) driver or executor residency. Size shards so a block's
    * smaller side fits task memory; pair count is invariant in the
    * shard counts.
    *
    * PARALLELISM BOUND: the shard-pair equi-join has exactly
    * `Qs × Cs` distinct keys, so the whole pair scan runs in at most
    * `Qs × Cs` tasks no matter what `spark.sql.shuffle.partitions`
    * says. Replication cost is LINEAR in the shard counts
    * (`Cs` copies of Q, `Qs` copies of C) while parallelism is their
    * PRODUCT, so sizing for a cluster is cheap: `Qs = Cs = 32` already
    * yields 1024-way parallelism at 32× replication of each side. Do
    * NOT size shards for memory alone on a big cluster — pick
    * `max(shards-for-memory, shards-for-cores)` per side, or use
    * [[shardedTopKAuto]] which derives both from row counts. The
    * shard-pair join is PINNED to sort-merge (spill-safe block
    * buffering): without the hint, Catalyst — or AQE at runtime —
    * happily broadcasts a "small" replicated embedding side at test
    * scale, which is exactly the plan shape this operator exists to
    * avoid and would mask the regression until the 100 TB run
    * (asserted by PlanShapeSpec's q134 final-plan sweep). */
  def shardedTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int, queryShards: Int, corpusShards: Int)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(queryShards >= 1 && corpusShards >= 1,
      s"shard counts must be >= 1, got $queryShards x $corpusShards")
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
        VectorExprs.norm2(col(vec)).as("qn2"),
        pmod(xxhash64(col(id)), lit(queryShards.toLong)).cast("int")
          .as("qs"))
      .withColumn("cs", explode(sequence(lit(0), lit(corpusShards - 1))))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
        VectorExprs.norm2(col(vec)).as("cn2"),
        pmod(xxhash64(col(id)), lit(corpusShards.toLong)).cast("int")
          .as("cs"))
      .withColumn("qs", explode(sequence(lit(0), lit(queryShards - 1))))
    val scored = q.join(c.hint("merge"), Seq("qs", "cs"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        pairCosine(col("qv"), col("cv"), col("qn2"), col("cn2")))
    val w1 = Window.partitionBy(col("query_id"), col("cs"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val cand = scored.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** [[shardedTopK]] with shard counts DERIVED from the data instead of
    * guessed by the caller — the two failure modes of hand-picked
    * shards are (a) a block too big for task memory and (b) a task
    * count far below the cluster's cores (the Qs×Cs parallelism
    * bound). This derives both:
    *
    *  - memory: each side gets `ceil(|side| / targetBlockRows)` shards,
    *    so no block holds more than `targetBlockRows` rows of that side
    *    (at 64 float dims ≈ 260 B/row, the 500k default is a ~130 MB
    *    block — comfortable beside a few-GB task heap);
    *  - cores: shards then grow until `Qs × Cs >= minTasks` (default:
    *    the session's `defaultParallelism`), always bumping the side
    *    whose replication is cheaper to raise — incrementing Qs copies
    *    the corpus once more (|C| extra rows), incrementing Cs copies
    *    the queries (|Q| extra rows) — so the added shuffle bytes are
    *    minimal for the parallelism bought.
    *
    * Costs two column-pruned `count()` jobs up front — O(rows) scans of
    * the id column only, noise next to the pair scan they size. */
  def shardedTopKAuto(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int, targetBlockRows: Long = 500000L,
      minTasksOpt: Option[Int] = None): DataFrame = {
    require(targetBlockRows >= 1L,
      s"targetBlockRows must be >= 1, got $targetBlockRows")
    val nQ = queries.select(col(id)).count()
    val nC = corpus.select(col(id)).count()
    val minTasks = minTasksOpt.getOrElse(
      corpus.sparkSession.sparkContext.defaultParallelism)
    def forMemory(n: Long): Int =
      math.min(Int.MaxValue.toLong,
        math.max(1L, (n + targetBlockRows - 1L) / targetBlockRows)).toInt
    var qs = forMemory(nQ)
    var cs = forMemory(nC)
    while (qs.toLong * cs < minTasks && (nQ > qs || nC > cs)) {
      // bump the side that adds the fewer replicated rows — raising qs
      // copies the corpus once more (|C| rows), raising cs copies the
      // queries (|Q| rows) — but never past one row per shard (more
      // shards than rows buys nothing)
      val canQs = nQ > qs
      val canCs = nC > cs
      if (canQs && (!canCs || nC <= nQ)) qs += 1
      else cs += 1
    }
    shardedTopK(corpus, queries, id, vec, k, qs, cs)
  }

  /** Margin-based alignment of two embedding sets (Artetxe & Schwenk
    * 2019's ratio margin — the bitext-mining criterion that made
    * CCMatrix/WikiMatrix-scale parallel-corpus curation work): for each
    * `a`-side vector, its nearest `b`-side neighbor scored by
    * `margin = cos(x,y) / ((avgK_fwd(x) + avgK_bwd(y)) / 2)` — raw
    * cosine divided by the average similarity of each endpoint's own
    * k-neighborhood, which cancels hubness (dense regions where
    * everything is cosine-close score margins ≈ 1 and are rejected).
    * `mutual` flags pairs that are nearest neighbors of each other —
    * the strict intersection criterion of the paper.
    *
    * Determinism: both directions' cosines snap to 4 decimals
    * ([[bruteForceTopK]]'s contract); neighborhood averages sum those
    * exact 4-decimal values in DECIMAL (order-free) before one double
    * division, and the margin is one further fixed-sequence double op,
    * snapped to 6 — the oracle replays every pair, margin, and flag.
    *
    * Scale shape: two exact top-k passes plus joins over queries × k
    * METADATA rows only. `shards` picks the top-k execution:
    *  - `shards = 1` (fixture/bounded regime): [[bruteForceTopK]] —
    *    each pass broadcasts its query side, and since the passes swap
    *    roles BOTH sets must fit a broadcast;
    *  - `shards > 1` (mining regime — the operator's own stated use
    *    case, where both sides are corpora): [[shardedTopK]] with
    *    `shards × shards` blocks — NO broadcast of either set, blocks
    *    stream through one shard-pair equi-join, per-shard k-lists
    *    merge associatively. Identical output by construction (total
    *    tie order), so the two regimes share one oracle. */
  def marginAlign(a: DataFrame, b: DataFrame, id: String, vec: String,
      k: Int, shards: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val fwd =
      if (shards <= 1) bruteForceTopK(b, a, id, vec, k)
      else shardedTopK(b, a, id, vec, k, shards, shards)
    val bwd =
      if (shards <= 1) bruteForceTopK(a, b, id, vec, k)
      else shardedTopK(a, b, id, vec, k, shards, shards)
    def avgK(r: DataFrame): DataFrame = r.groupBy(col("query_id"))
      .agg((sum(col("cos").cast("decimal(18,4)")).cast("double") /
        count(lit(1)).cast("double")).as("avg_cos"))
    val aF = avgK(fwd).select(col("query_id").as("src_id"),
      col("avg_cos").as("avg_fwd"))
    val aB = avgK(bwd).select(col("query_id").as("tgt_id"),
      col("avg_cos").as("avg_bwd"))
    val nn1 = fwd.filter(col("rank") === 1)
      .select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("cos"))
    val back1 = bwd.filter(col("rank") === 1)
      .select(col("query_id").as("tgt_id"),
        col("neighbor_id").as("back_src"))
    nn1.join(aF, Seq("src_id")).join(aB, Seq("tgt_id"))
      .join(back1, Seq("tgt_id"), "left")
      .select(col("src_id"), col("tgt_id"), col("cos"),
        round(col("cos") /
          ((col("avg_fwd") + col("avg_bwd")) / lit(2.0)), 6).as("margin"),
        coalesce(col("back_src") === col("src_id"), lit(false))
          .as("mutual"))
  }

  /** Simplified (centroid-based) silhouette per cluster — the
    * clustering-QA number for the IVF/k-means family: for each point,
    * `a` = distance to its OWN (nearest) centroid, `b` = distance to
    * the runner-up centroid, silhouette `s = (b − a) / max(a, b)`
    * (Rousseeuw 1987's per-point ratio with centroid distances standing
    * in for mean intra/inter-cluster distances — the O(N·k) form
    * surveyed as "simplified silhouette"; the classical O(N²) form
    * cannot exist at corpus scale). Output, one row per cluster:
    * `(cluster_id, n_points, mean_a, mean_b, mean_sil)` — a cluster
    * whose `mean_sil` approaches 0 is not separated from its neighbor
    * (its IVF list boundary cuts through a real cluster → recall loss
    * at low nprobe); a panel-wide drop flags a bad `k`.
    *
    * Centroids arrive as LITERALS (`(cluster_id, vector)`), the
    * PQ-family codebook discipline — so the whole scan is map-side:
    * per point, `k` codegen'd distance expressions, one `array_sort`
    * of the k-struct array (ties on d² break on ascending centroid
    * id), zero shuffles before the clusters-cardinality aggregate.
    * Distances are `√max(0, ⟨v,v⟩ − 2⟨v,c⟩ + ⟨c,c⟩)` — the expansion
    * reuses the [[bruteForceTopK]] dot kernel and the max(0,·) clamps
    * the tiny negative the expansion can produce at near-zero
    * distances. Means snap per-point values to 1e-9 fixed point and
    * sum in DECIMAL(38,0) (order-free), one snap-6 division each.
    * `max(a,b) = 0` (point sits ON both centroids) contributes
    * silhouette 0 by convention. */
  def clusterSilhouette(points: DataFrame, vec: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    require(centroids.size >= 2,
      s"clusterSilhouette needs >= 2 centroids, got ${centroids.size}")
    require(centroids.map(_._1).distinct.size == centroids.size,
      "centroid ids must be distinct")
    val dims = centroids.head._2.size
    require(centroids.forall(_._2.size == dims),
      "centroid vectors must share one dimensionality")
    val v = col(vec).cast("array<double>")
    val vv = VectorExprs.norm2(v)
    val dists = centroids.map { case (cid, c) =>
      val cArr = array(c.map(lit): _*)
      val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
      struct(sqrt(greatest(vv - lit(2.0) * VectorExprs.dot(v, cArr) +
        lit(cc), lit(0.0))).as("d"), lit(cid).as("cid"))
    }
    val sorted = array_sort(array(dists: _*))
    val aD = element_at(col("ds"), 1)("d")
    val bD = element_at(col("ds"), 2)("d")
    val sil = when(greatest(aD, bD) === 0.0, lit(0.0))
      .otherwise((bD - aD) / greatest(aD, bD))
    points
      // null / wrong-dims embeddings would null every distance, tie-break
      // into the lowest centroid id, and deflate that cluster's means
      // while inflating n_points — same fixed-dims contract as
      // sourceAffinityRaw
      .filter(v.isNotNull && size(v) === dims)
      .select(sorted.as("ds"))
      .select(element_at(col("ds"), 1)("cid").as("cluster_id"),
        round(aD * 1e9).cast("decimal(38,0)").as("a9"),
        round(bD * 1e9).cast("decimal(38,0)").as("b9"),
        round(sil * 1e9).cast("decimal(38,0)").as("s9"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("a9")).as("sa"), sum(col("b9")).as("sb"),
        sum(col("s9")).as("ss"))
      .select(col("cluster_id"), col("n_points"),
        round(col("sa").cast("double") / 1e9 /
          col("n_points").cast("double"), 6).as("mean_a"),
        round(col("sb").cast("double") / 1e9 /
          col("n_points").cast("double"), 6).as("mean_b"),
        round(col("ss").cast("double") / 1e9 /
          col("n_points").cast("double"), 6).as("mean_sil"))
  }
}
