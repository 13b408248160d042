package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TimeExprs, VectorExprs}
import graft.operators.{Dedup, NearDup, Similarity}
import graft.sources.Tables

/** Mixing and selection: budget/temperature/DoReMi/UniMax mixes, DSIR, rebalancing, splits, caps, shards, curation composition.
  *
  * One domain slice of the query registry (split from the single-file
  * registry in round 15 — same members, same semantics). Members are
  * `private[queries]` so cross-domain references keep working; `val`s
  * became `lazy val`s so initialization is order-independent across the
  * trait mix-in. Mixed into [[TestdataQueries]], which owns the maps.
  */
private[queries] trait TdqMix { this: TestdataQueries.type =>

  // --------------------------------- deterministic hash sampling (§2.10)
  // Content-hash sampling: keep ~5% of docs by polynomial fingerprint —
  // reproducible across engines and runs (unlike rand()/TABLESAMPLE),
  // the standard way to cut a stable eval slice from a training corpus.
  private[queries] def q48HashSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .filter(pmod(TextExprs.polyFingerprint(col("text")), lit(100L)) < 5)
      .select(col("doc_id"), col("lang"), col("n_chars"))

  private[queries] lazy val q48Sql =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE length(text) > 0
      |  AND list_reduce(
      |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
      |        (a, c) -> (a * 31 + c) % 1000000007) % 100 < 5""".stripMargin

  // -------------------------------- stratified sampling (§2.10 corpus ops)
  // Per-language sampling rates over the same deterministic content
  // fingerprint as q48: high-resource langs downsampled hard, low-resource
  // kept — the standard corpus-rebalancing cut, reproducible everywhere.
  private[queries] lazy val q52Rates: Seq[(String, Int)] =
    Seq("en" -> 5, "de" -> 10, "es" -> 10, "fr" -> 20, "zh" -> 50)

  private[queries] def q52StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val rate = q52Rates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, r).otherwise(acc)
    }
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .filter(pmod(TextExprs.polyFingerprint(col("text")), lit(100L)) < rate)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
  }

  private[queries] lazy val q52Sql = {
    val rate = "CASE " + q52Rates.map { case (l, r) =>
      s"WHEN lang = '$l' THEN $r" }.mkString(" ") + " ELSE 0 END"
    s"""SELECT lang, count(*) AS n_sampled FROM documents
       |WHERE length(text) > 0
       |  AND list_reduce(
       |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
       |        (a, c) -> (a * 31 + c) % 1000000007) % 100 < $rate
       |GROUP BY lang""".stripMargin
  }

  // ------------------------------------ corpus curation composition (§2.10)
  // The end-to-end training-set cut, composed from the proven pieces:
  // quality floor (q30's score) → exact dedup keep-min-id (q9) → recall-
  // certain minhash near-dup clusters keep-one-representative (q19/q44).
  // Each stage's semantics are mirrored stage-by-stage in the oracle, so
  // the COMPOSITION — stage order, survivor propagation, which rows the
  // cluster representatives come from — is what gets hash-checked.
  private[queries] lazy val q55QualityFloor = 0.4

  /** The curation pipeline PRE-spill — the plan PlanShapeSpec's broadcast/
    * no-cartesian assertions inspect (the registered query's returned plan
    * is the spill read-back scan, which would vacuously pass). Callers
    * other than [[q55CorpusCuration]] must run it under their own
    * [[graft.operators.CacheHygiene.withRddCleanup]] scope: the `exact`
    * persist and the CC loop's checkpoint-pinned caches belong to the
    * call, not the session. */
  private[graft] def q55CurationInner(s: SparkSession, d: String): DataFrame = {
    val flt = Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("quality",
        round(TextExprs.qualityScore(col("text")), 6))
      .filter(col("quality") >= q55QualityFloor)
    val exact = Dedup.exactDedup(flt, col("text"), col("doc_id")).persist()
    val edges = NearDup.minhashLshPairs(exact, col("doc_id"), col("text"),
        n = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val reps = graft.operators.DupClusters.connectedComponents(
        exact.select(col("doc_id").as("id")), edges)
      .filter(col("id") === col("cluster_rep"))
      .select(col("id").as("doc_id"))
    exact.join(reps, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("quality"))
  }

  private[queries] def q55CorpusCuration(s: SparkSession, d: String): DataFrame =
    // Terminal materializing pipeline: curation's survivor listing is
    // written once by any real consumer, so the whole body runs under a
    // scoped cache guard and the NARROW output (doc_id, lang, quality —
    // no text) spills to parquet. The corpus-sized `exact` persist —
    // referenced by the edge pipeline, the CC vertices, and the final
    // semijoin, so the regex-heavy quality scoring and the dedup window
    // run once — is therefore scoped to the call: no cache outlives it
    // (registry hygiene sweep, PlanShapeSpec), and consuming the result
    // re-reads spill files instead of recomputing two corpus scans.
    graft.operators.CacheHygiene.withRddCleanup(s) {
      graft.operators.CacheHygiene.spillToTempParquet(
        q55CurationInner(s, d), "graft-q55-")
    }

  private[queries] lazy val q55Sql =
    s"""WITH RECURSIVE
       |flt AS (
       |  SELECT doc_id, lang, text, round(
       |  $qualitySqlBody,
       |  6) AS quality
       |  FROM documents WHERE length(trim(text)) > 0),
       |q AS (SELECT * FROM flt WHERE quality >= $q55QualityFloor),
       |ex AS (
       |  SELECT doc_id, lang, text, quality FROM (
       |    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |    FROM q) WHERE rn = 1),
       |${jaccardPairsCteOver("ex")},
       |und AS (
       |  SELECT id_a AS src, id_b AS dst FROM jpairs WHERE jaccard >= 0.8
       |  UNION ALL
       |  SELECT id_b, id_a FROM jpairs WHERE jaccard >= 0.8),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM ex
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN und e ON e.src = reach.id),
       |labels AS (SELECT id, min(r) AS cluster_rep FROM reach GROUP BY id)
       |SELECT ex.doc_id, ex.lang, ex.quality
       |FROM ex JOIN labels ON labels.id = ex.doc_id
       |WHERE labels.cluster_rep = ex.doc_id""".stripMargin

  // ------------------------- token-budget sharding (§2.10 ext)
  // Global exclusive-prefix-sum sharding without the single-task window:
  // the oracle IS the naive `SUM() OVER (ORDER BY ...)` — the operator
  // must equal it while never moving the table into one task.
  private[queries] lazy val q60Budget = 2000L

  private[queries] def q60TokenShards(s: SparkSession, d: String): DataFrame =
    graft.operators.Shard.byBudget(
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextExprs.tokenCount(col("text")).cast("long").as("n_tok")),
      orderCol = "doc_id", weightCol = "n_tok", budget = q60Budget)

  private[queries] lazy val q60Sql =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
       |         AS BIGINT) AS n_tok
       |  FROM documents)
       |SELECT doc_id, n_tok,
       |  CAST(coalesce(SUM(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    // $q60Budget AS BIGINT) AS shard
       |FROM t""".stripMargin

  // ----------------------------- mixture sampling (§2.10 ext)
  // Per-source token-budget downsampling: integer keep-rate from the
  // group totals, portable-hash keep decision — the corpus never
  // shuffles, and the oracle replays every row's decision.
  private[queries] lazy val q73Budget = 800L
  private[queries] lazy val q73Scale = 10000

  private[queries] def q73MixSample(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.sampleToBudget(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextExprs.tokenCount(col("text")).as("n_toks")),
      col("doc_id"), col("source"), col("n_toks"), q73Budget, q73Scale)
      .select(col("id").as("doc_id"), col("grp").as("source"),
        col("w").as("n_toks"), col("rate_bp"))

  private[queries] lazy val q73Sql = {
    val poly = "list_reduce(list_transform(string_split(CAST(doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val mh = s"((($poly * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    s"""WITH rows_ AS (
       |  SELECT doc_id, source,
       |    CAST(len(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS BIGINT) AS n_toks
       |  FROM documents),
       |rates AS (
       |  SELECT source, CAST(least($q73Scale,
       |      ($q73Budget * $q73Scale) // sum(n_toks)) AS BIGINT) AS rate_bp
       |  FROM rows_ GROUP BY source),
       |h AS (SELECT doc_id, source, n_toks, $mh AS mh FROM rows_)
       |SELECT h.doc_id, h.source, h.n_toks, r.rate_bp
       |FROM h JOIN rates r USING (source)
       |WHERE mh % $q73Scale < rate_bp""".stripMargin
  }

  // ----------------------------- train/val/test split (§2.10 ext)
  // Deterministic 90/5/5 assignment by portable id-hash buckets — held-out
  // sets stay held out across dataset versions because a row's split is a
  // pure function of its id. The oracle replays the hash fold.
  private[queries] def q87Splits(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.assignSplits(
        Tables.documents(s, d).select(col("doc_id")), col("doc_id"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select(col("doc_id"), col("split"))

  private[queries] lazy val q87Sql = {
    // the raw polynomial fold, then Sketch.mixedHash's two bijective mix
    // rounds verbatim (same replay as the q56/q73 oracles) — assignSplits
    // buckets on the MIXED hash so structured id sets can't skew splits
    val poly = "list_reduce(list_transform(string_split(CAST(doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val mh = s"((($poly * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    s"""SELECT doc_id,
       |  CASE WHEN h < 9000 THEN 'train'
       |       WHEN h < 9500 THEN 'val' ELSE 'test' END AS split
       |FROM (SELECT doc_id, $mh % 10000 AS h FROM documents)""".stripMargin
  }

  // ----------------------------- DSIR importance weights (§2.10 ext)
  // Data Selection via Importance Resampling (Xie et al. 2023): raw-pool
  // docs scored by hashed-n-gram likelihood ratio vs the target domain
  // (source = 'src0'), unigram+bigram features into 1024 buckets, add-1
  // smoothing. Bucket hash = the oracle-portable poly fold (q87's replay
  // discipline); ln-sum rounding(4) follows the LM-oracle precedent.
  private[queries] lazy val q110Buckets = 1024

  private[queries] def q110DsirWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Dsir.importanceWeights(
      raw = docs.filter(col("source") =!= "src0"),
      target = docs.filter(col("source") === "src0"),
      col("doc_id"), col("text"), buckets = q110Buckets)
  }

  private[queries] lazy val q110Sql = {
    val b = q110Buckets
    val poly = "list_reduce(list_transform(string_split(g, ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 2147483647)"
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, source, unnest(list_concat(ts,
       |    [array_to_string(ts[i:i+1], ' ') for i in range(1, len(ts))])) AS g
       |  FROM toks),
       |gb AS (SELECT doc_id, source, $poly % $b AS bk FROM grams),
       |tb AS (SELECT bk, count(*) AS ct FROM gb WHERE source = 'src0' GROUP BY bk),
       |rb AS (SELECT bk, count(*) AS cr FROM gb WHERE source <> 'src0' GROUP BY bk),
       |tot AS (SELECT (SELECT sum(ct) FROM tb) AS nt,
       |               (SELECT sum(cr) FROM rb) AS nr),
       |lr AS (
       |  SELECT coalesce(tb.bk, rb.bk) AS bk,
       |    ln(((coalesce(ct, 0) + 1.0) / (nt + $b)) /
       |       ((coalesce(cr, 0) + 1.0) / (nr + $b))) AS lr
       |  FROM tb FULL JOIN rb ON tb.bk = rb.bk CROSS JOIN tot),
       |doc AS (
       |  SELECT doc_id, count(*) AS n_grams, round(sum(lr), 4) AS logw
       |  FROM gb JOIN lr ON gb.bk = lr.bk WHERE source <> 'src0'
       |  GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(d.n_grams, 0) AS n_grams,
       |  coalesce(d.logw, 0.0) AS logw,
       |  coalesce(d.logw, 0.0) > 0.0 AS selected
       |FROM (SELECT doc_id FROM documents WHERE source <> 'src0') t
       |LEFT JOIN doc d ON t.doc_id = d.doc_id""".stripMargin
  }

  // ----------------------------- per-source document cap (§2.10 ext)
  // RefinedWeb-style per-domain cap: best-quality `n` docs survive per
  // source. Empty docs excluded on both sides (q30 parity).
  private[queries] lazy val q115Cap = 10

  private[queries] def q115SourceCap(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
    graft.operators.Mix.capPerGroup(docs, col("doc_id"), col("source"),
      graft.functions.TextExprs.qualityScore(col("text")), n = q115Cap)
  }

  private[queries] lazy val q115Sql =
    s"""WITH sc AS (
       |  SELECT source AS grp, doc_id AS id,
       |    $qualitySqlBody AS q
       |  FROM documents WHERE length(trim(text)) > 0)
       |SELECT grp, rank, id, round(q, 4) AS quality
       |FROM (SELECT grp, id, q, CAST(row_number() OVER (
       |        PARTITION BY grp ORDER BY q DESC, id) AS INTEGER) AS rank
       |      FROM sc) WHERE rank <= $q115Cap""".stripMargin

  // ------------------- temperature-scaled mixture sampling (§2.10 ext)
  // q73's budget mixing with `p_g ∝ T_g^α` target shares (α = 0.7 — the
  // mBERT/XLM-R small-source up-weighting). The only transcendental step
  // (exp/ln pow) is per-group local with its output snapped to 6
  // decimals before the cross-group decimal sum, so every rate — and
  // therefore every row's keep decision — replays exactly.
  private[queries] lazy val q126Alpha = 0.7
  private[queries] lazy val q126Budget = 8000L
  private[queries] lazy val q126Scale = 10000

  private[queries] def q126TemperatureMix(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.temperatureSample(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextExprs.tokenCount(col("text")).as("n_toks")),
      col("doc_id"), col("source"), col("n_toks"),
      q126Alpha, q126Budget, q126Scale)
      .select(col("id").as("doc_id"), col("grp").as("source"),
        col("w").as("n_toks"), col("rate_bp"))

  /** q126's oracle as a CTE list (no leading WITH) over any document
    * relation — shared with q183's dedup-aware composition. */
  private[queries] def temperatureMixCtes(docsRel: String): String = {
    val poly = "list_reduce(list_transform(string_split(CAST(doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val mh = s"((($poly * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    val aS = q126Alpha.toString
    val am1S = (q126Alpha - 1.0).toString
    val bsS = (q126Budget * q126Scale).toDouble.toString
    s"""rows_ AS (
       |  SELECT doc_id, source,
       |    CAST(len(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS BIGINT) AS n_toks
       |  FROM $docsRel),
       |tot AS (SELECT source, sum(n_toks) AS t FROM rows_
       |        GROUP BY source HAVING sum(n_toks) > 0),
       |ta AS (SELECT source, t,
       |      CAST(round(exp($aS * ln(CAST(t AS DOUBLE))), 6)
       |        AS DECIMAL(38,6)) AS ea FROM tot),
       |dn AS (SELECT sum(ea) AS s FROM ta),
       |rates AS (
       |  SELECT source, least($q126Scale, CAST(floor(round(
       |      ($bsS * exp($am1S * ln(CAST(t AS DOUBLE)))) /
       |        CAST(s AS DOUBLE), 6)) AS BIGINT)) AS rate_bp
       |  FROM ta CROSS JOIN dn),
       |h AS (SELECT doc_id, source, n_toks, $mh AS mh FROM rows_)
       |SELECT h.doc_id, h.source, h.n_toks, r.rate_bp
       |FROM h JOIN rates r USING (source)
       |WHERE mh % $q126Scale < rate_bp""".stripMargin
  }

  private[queries] lazy val q126Sql = "WITH " + temperatureMixCtes("documents")

  // ------------------- weighted priority sampling (§2.10 ext)
  // A-ES weighted sampling without replacement, k per source, weight =
  // token count: rank on round(ln(u)/w, 9) with u hash-derived — no
  // RNG; the oracle replays key, rank, and membership.
  private[queries] lazy val q133K = 5

  private[queries] def q133PrioritySample(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.prioritySampleByGroup(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextExprs.tokenCount(col("text")).as("n_toks")),
      col("doc_id"), col("source"), col("n_toks"), q133K)
      .select(col("grp").as("source"), col("rank"),
        col("id").as("doc_id"), col("key"))

  private[queries] lazy val q133Sql = {
    val poly = "list_reduce(list_transform(string_split(CAST(doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val mh = s"((($poly * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    s"""WITH rows_ AS (
       |  SELECT doc_id, source,
       |    CAST(len(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS DOUBLE) AS w
       |  FROM documents),
       |ky AS (
       |  SELECT doc_id, source,
       |    round(ln(CAST($mh + 1 AS DOUBLE) / 1000000008.0) / w, 9) AS key
       |  FROM rows_ WHERE w > 0),
       |r AS (SELECT source, doc_id, key, row_number() OVER (
       |        PARTITION BY source ORDER BY key DESC, doc_id) AS rank
       |      FROM ky)
       |SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, key
       |FROM r WHERE rank <= $q133K""".stripMargin
  }

  // ------------------- corpus mix drift (§2.10 ext)
  // The monitoring panel between two ingest snapshots: simulate an
  // upstream outage (src3 vanishes) plus a partial shift (half of src7)
  // and report per-source token-share deltas + the snap-9 JS-divergence
  // contributions. Shares are exact int ratios; the ln terms snap to
  // 1e-9 fixed-point per source (q72 discipline) so the oracle replays
  // every row.
  private[queries] def q152MixDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val newer = docs.filter(col("source") =!= "src3" &&
      !(col("source") === "src7" && col("doc_id") % 2 === 0))
    graft.operators.Datasheet.mixDrift(docs, newer,
      col("text"), col("source"))
  }

  private[queries] lazy val q152Sql =
    s"""WITH tok AS (SELECT source, doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt
       |  FROM documents),
       |o AS (SELECT source AS src, count(*) AS old_docs,
       |    CAST(sum(nt) AS BIGINT) AS old_tokens FROM tok GROUP BY 1),
       |n AS (SELECT source AS src, count(*) AS new_docs,
       |    CAST(sum(nt) AS BIGINT) AS new_tokens FROM tok
       |  WHERE source <> 'src3' AND NOT (source = 'src7' AND doc_id % 2 = 0)
       |  GROUP BY 1),
       |j AS (SELECT COALESCE(o.src, n.src) AS src,
       |    COALESCE(old_docs, 0) AS old_docs,
       |    COALESCE(new_docs, 0) AS new_docs,
       |    COALESCE(old_tokens, 0) AS old_tokens,
       |    COALESCE(new_tokens, 0) AS new_tokens
       |  FROM o FULL OUTER JOIN n ON o.src = n.src),
       |t AS (SELECT CAST(sum(old_tokens) AS BIGINT) AS ot,
       |    CAST(sum(new_tokens) AS BIGINT) AS nt2 FROM j),
       |x AS (SELECT j.*,
       |    CAST(old_tokens AS DOUBLE) / CAST(greatest(ot, 1) AS DOUBLE) AS p,
       |    CAST(new_tokens AS DOUBLE) / CAST(greatest(nt2, 1) AS DOUBLE) AS q
       |  FROM j CROSS JOIN t)
       |SELECT src, CAST(old_docs AS BIGINT) AS old_docs,
       |  CAST(new_docs AS BIGINT) AS new_docs, old_tokens, new_tokens,
       |  round(p, 6) AS old_share, round(q, 6) AS new_share,
       |  round(q - p, 6) AS delta_share,
       |  CAST(round((CASE WHEN old_tokens = 0 AND new_tokens = 0 THEN 0.0
       |    ELSE (CASE WHEN old_tokens > 0
       |            THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END) +
       |         (CASE WHEN new_tokens > 0
       |            THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)
       |    END) * 1e9) AS BIGINT) AS js_e9
       |FROM x""".stripMargin

  // ------------------- split-leakage report (§2.10 ext)
  // THE check before trusting a val/test number: near-dup pairs that
  // straddle split boundaries (q19's verified pairs × q87's hash split
  // assignment). An off-diagonal (train,val)/(train,test) row means the
  // eval set contains near-copies of training docs and its loss is
  // fiction. Same operator as q164 — the split IS a source-like
  // partition of the corpus.
  private[queries] def q167SplitLeakage(s: SparkSession, d: String): DataFrame =
    graft.operators.Datasheet.nearDupSourceMatrix(
      q19MinhashLsh(s, d).select(col("id_a"), col("id_b")),
      q87Splits(s, d).select(col("doc_id").as("id"),
        col("split").as("source")))
      .withColumnRenamed("src_a", "split_a")
      .withColumnRenamed("src_b", "split_b")

  private[queries] lazy val q167Sql =
    s"""WITH pr AS (SELECT id_a, id_b FROM ($q19Sql)),
       |sp AS (SELECT doc_id, split FROM ($q87Sql)),
       |j AS (SELECT least(sa.split, sb.split) AS split_a,
       |    greatest(sa.split, sb.split) AS split_b
       |  FROM pr JOIN sp sa ON sa.doc_id = pr.id_a
       |          JOIN sp sb ON sb.doc_id = pr.id_b)
       |SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs
       |FROM j GROUP BY split_a, split_b""".stripMargin

  // ------------------- leakage-free split assignment (§2.10 ext)
  // The FIX for what q167 detects: hash-split on the near-dup CLUSTER
  // representative instead of the doc id, so near-copies land in the
  // same split by construction and the q167 leakage matrix is diagonal
  // — no post-hoc filtering, the assignment itself is leakage-free.
  // Composition of q44's clusters with q87's split law; the oracle
  // replays the CC and the mixed-hash split over cluster_rep.
  private[queries] def q186ClusterSplit(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.assignSplits(q44DupClusters(s, d),
        col("cluster_rep"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select(col("doc_id"), col("cluster_rep"), col("split"))

  private[queries] lazy val q186Sql = {
    val poly = "list_reduce(list_transform(string_split(" +
      "CAST(cluster_rep AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val mh = s"((($poly * 1103515245 + 12345) % 1000000007) * " +
      "2654435761) % 1000000007"
    s"""WITH cl AS (SELECT doc_id, cluster_rep FROM ($q44Sql))
       |SELECT doc_id, cluster_rep,
       |  CASE WHEN h < 9000 THEN 'train'
       |       WHEN h < 9500 THEN 'val' ELSE 'test' END AS split
       |FROM (SELECT doc_id, cluster_rep, $mh % 10000 AS h FROM cl)""".stripMargin
  }

  // ------------------- dedup-aware temperature mix (§2.10 ext)
  // The mixing mistake q168 exists to expose, fixed in-plan: a
  // dup-heavy source inflates its RAW token share, so temperature
  // rates computed pre-dedup over-sample it. Composition: q44's
  // cluster representatives first, THEN q126's temperature sampling —
  // rates now derive from effective (post-dedup) totals. Both stages
  // are the registered operators; the oracle composes both oracles.
  private[queries] def q183DedupAwareMix(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val reps = q44DupClusters(s, d)
      .filter(col("doc_id") === col("cluster_rep")).select("doc_id")
    graft.operators.Mix.temperatureSample(
      docs.join(reps, Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          TextExprs.tokenCount(col("text")).as("n_toks")),
      col("doc_id"), col("source"), col("n_toks"),
      q126Alpha, q126Budget, q126Scale)
      .select(col("id").as("doc_id"), col("grp").as("source"),
        col("w").as("n_toks"), col("rate_bp"))
  }

  private[queries] lazy val q183Sql =
    s"""WITH cl AS (SELECT doc_id, cluster_rep FROM ($q44Sql)),
       |dedup AS (SELECT d.doc_id, d.source, d.text FROM documents d
       |  JOIN cl ON d.doc_id = cl.doc_id
       |  WHERE cl.doc_id = cl.cluster_rep),
       |${temperatureMixCtes("dedup")}""".stripMargin

  // ------------------- DoReMi-lite domain reweighting (§2.10 ext)
  // One exponentiated-gradient step on per-source excess unigram loss:
  // sources the corpus-wide LM models badly (vocabulary far from the
  // mixture) gain weight over their raw token share. The oracle replays
  // the whole chain — smoothed distributions, the 1e-9-snapped log-ratio
  // terms, HUGEINT/decimal numerators, the 1e-12-snapped exp outputs —
  // so the hash match certifies the fixed-point discipline end to end.
  private[queries] def q174DoremiWeights(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.doremiReweight(Tables.documents(s, d),
      col("text"), col("source"), eta = 1.0, smoothing = 0.2)

  private[queries] lazy val q174Sql =
    s"""WITH tok AS (SELECT source AS src,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
       |  FROM documents
       |  WHERE length(trim(text)) > 0 AND source IS NOT NULL),
       |sc AS (SELECT src, t, count(*) AS c_st FROM tok GROUP BY 1, 2),
       |gc AS (SELECT t, CAST(sum(c_st) AS BIGINT) AS c_t FROM sc GROUP BY 1),
       |st AS (SELECT src, CAST(sum(c_st) AS BIGINT) AS n_s FROM sc GROUP BY 1),
       |tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_corpus,
       |    CAST(count(*) AS BIGINT) AS v FROM gc),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS k_src FROM st),
       |terms AS (SELECT sc.src, st.n_s, tot.n_corpus, kk.k_src,
       |    CAST(sc.c_st AS HUGEINT) * CAST(round(ln(
       |      (CAST(sc.c_st + 1 AS DOUBLE) / CAST(st.n_s + tot.v AS DOUBLE)) /
       |      (CAST(gc.c_t + 1 AS DOUBLE) /
       |       CAST(tot.n_corpus + tot.v AS DOUBLE))) * 1e9) AS BIGINT)
       |      AS term_e9
       |  FROM sc JOIN gc USING (t) JOIN st USING (src)
       |    CROSS JOIN tot CROSS JOIN kk),
       |ex AS (SELECT src, n_s, n_corpus, k_src, sum(term_e9) AS ex_e9
       |  FROM terms GROUP BY 1, 2, 3, 4),
       |sc2 AS (SELECT src, n_s, k_src,
       |    greatest(CAST(ex_e9 AS DOUBLE) / (CAST(n_s AS DOUBLE) * 1e9),
       |      0.0) AS excess,
       |    CAST(n_s AS DOUBLE) / CAST(n_corpus AS DOUBLE) AS base_share,
       |    CAST(round(CAST(n_s AS DOUBLE) / CAST(n_corpus AS DOUBLE) *
       |      exp(1.0 * greatest(
       |        CAST(ex_e9 AS DOUBLE) / (CAST(n_s AS DOUBLE) * 1e9), 0.0)) *
       |      1e12) AS BIGINT) AS raw_e12
       |  FROM ex),
       |dn AS (SELECT CAST(sum(raw_e12) AS BIGINT) AS denom_e12 FROM sc2)
       |SELECT src, n_s AS n_tokens, round(excess, 6) AS excess,
       |  round(base_share, 6) AS base_share,
       |  round(CAST(raw_e12 AS DOUBLE) / CAST(denom_e12 AS DOUBLE), 6)
       |    AS eg_share,
       |  round(CAST(raw_e12 AS DOUBLE) / CAST(denom_e12 AS DOUBLE) * 0.8 +
       |    0.2 / CAST(k_src AS DOUBLE), 6) AS weight
       |FROM sc2 CROSS JOIN dn""".stripMargin

  // ------------------- DSIR Gumbel top-k resampling (§2.10 ext)
  // The resampling step that turns q110's importance weights into an
  // actual selected subset: key = logw + Gumbel noise derived from the
  // doc's poly fingerprint (deterministic, RNG-free, oracle-replayable),
  // top-20 per source by the 1e-9-snapped key (exact-Long ranking).
  private[queries] lazy val q194K = 20

  private[queries] def q194DsirResample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Dsir.gumbelTopK(
      raw = docs.filter(col("source") =!= "src0"),
      target = docs.filter(col("source") === "src0"),
      col("doc_id"), col("text"), col("source"),
      buckets = q110Buckets, k = q194K)
  }

  private[queries] lazy val q194Sql =
    s"""WITH w AS (SELECT doc_id, logw FROM ($q110Sql)),
       |p AS (SELECT doc_id, source AS src,
       |    list_reduce(list_transform(string_split(text, ''),
       |      c -> CAST(ascii(c) AS BIGINT)),
       |      (a, c) -> (a * 31 + c) % 1000000007) AS h
       |  FROM documents WHERE source <> 'src0' AND length(text) > 0),
       |k AS (SELECT p.doc_id, src,
       |    CAST(round((logw - ln(-ln((CAST(h % 999983 AS DOUBLE) + 0.5)
       |      / 999983.0))) * 1e9) AS BIGINT) AS key_e9
       |  FROM p JOIN w ON p.doc_id = w.doc_id)
       |SELECT src, CAST(rank AS INTEGER) AS rank, doc_id,
       |  round(CAST(key_e9 AS DOUBLE) / 1e9, 6) AS key
       |FROM (SELECT *, row_number() OVER (
       |    PARTITION BY src ORDER BY key_e9 DESC, doc_id) AS rank FROM k)
       |WHERE rank <= $q194K""".stripMargin

  // ------------------- rebalance to target shares (§2.10 ext)
  // Post-stratification: the largest subset matching target language
  // shares (T = min n_c/t_c; limiting category kept whole), hash-keep
  // decisions replayed row-for-row by the oracle. Shares are powers of
  // two so the normalized literals are exact in both engines.
  private[queries] lazy val q226Targets = Seq("en" -> 0.25, "fr" -> 0.25,
    "de" -> 0.25, "es" -> 0.125, "zh" -> 0.125)
  private[queries] lazy val q226Scale = 1000000

  private[queries] def q226Rebalance(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.rebalanceToTarget(Tables.documents(s, d),
      col("doc_id"), col("lang"), q226Targets, q226Scale)

  private[queries] lazy val q226Sql = {
    val z = q226Targets.map(_._2).sum
    val cats = q226Targets.map(t => s"'${t._1}'").mkString(", ")
    val caseTgt = "CASE cat " + q226Targets.map { case (c, sh) =>
      s"WHEN '$c' THEN CAST(${sh / z} AS DOUBLE)"
    }.mkString(" ") + " END"
    val poly = "list_reduce(list_transform(" +
      "string_split(CAST(doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    s"""WITH c AS (SELECT lang AS cat, CAST(count(*) AS BIGINT) AS n
       |  FROM documents WHERE lang IN ($cats) GROUP BY 1),
       |x AS (SELECT cat, n, $caseTgt AS tgt FROM c),
       |tt AS (SELECT min(CAST(n AS DOUBLE) / tgt) AS t FROM x),
       |r AS (SELECT cat, n, tgt, least($q226Scale,
       |    CAST(floor(round(t * tgt / CAST(n AS DOUBLE) * $q226Scale,
       |      6)) AS BIGINT)) AS rate_bp
       |  FROM x CROSS JOIN tt),
       |k AS (SELECT d.lang AS cat, CAST(count(*) AS BIGINT) AS n_kept
       |  FROM documents d JOIN r ON r.cat = d.lang
       |  WHERE (((($poly * 1103515245 + 12345) % 1000000007) *
       |    2654435761) % 1000000007) % $q226Scale < r.rate_bp
       |  GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_kept) AS BIGINT) AS tk FROM k)
       |SELECT r.cat, r.n, round(r.tgt, 6) AS target_share, r.rate_bp,
       |  COALESCE(k.n_kept, CAST(0 AS BIGINT)) AS n_kept,
       |  round(CAST(COALESCE(k.n_kept, 0) AS DOUBLE) /
       |    CAST(tot.tk AS DOUBLE), 6) AS realized_share
       |FROM r LEFT JOIN k USING (cat) CROSS JOIN tot""".stripMargin
  }

  // ------------------- UniMax allocation (§2.10 ext)
  // Epoch-capped uniform budget split (Chung et al. 2023): exact
  // water-filling on the sources-cardinality totals table. With
  // maxEpochs=1 and an 26k budget over ~27k tokens, the small sources
  // cap at one epoch and the rest share the remaining budget at the
  // water level.
  private[queries] lazy val q198Budget = 26000L
  private[queries] lazy val q198MaxEpochs = 1.0

  private[queries] def q198Unimax(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.unimaxAllocate(Tables.documents(s, d),
      col("source"),
      graft.functions.TextExprs.tokenCount(col("text")),
      q198Budget, q198MaxEpochs)

  private[queries] lazy val q198Sql =
    s"""WITH tot AS (SELECT source AS grp, CAST(sum(
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
       |    AS BIGINT) AS t_total
       |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
       |live AS (SELECT grp, t_total,
       |    CAST(round(CAST(t_total AS DOUBLE) * $q198MaxEpochs * 1e6)
       |      AS BIGINT) AS cap_e6
       |  FROM tot WHERE t_total > 0),
       |sc AS (SELECT *,
       |    row_number() OVER (ORDER BY cap_e6, grp) AS idx,
       |    sum(CAST(cap_e6 AS HUGEINT)) OVER (ORDER BY cap_e6, grp
       |      ROWS UNBOUNDED PRECEDING) AS p_cum,
       |    count(*) OVER () AS s_all
       |  FROM live),
       |c AS (SELECT *,
       |    CAST(cap_e6 AS HUGEINT) * (s_all - idx + 1) +
       |      (p_cum - cap_e6) <= ${q198Budget}000000::HUGEINT AS capped
       |  FROM sc),
       |f AS (SELECT *,
       |    sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS n_capped,
       |    max(CASE WHEN capped THEN p_cum END) OVER () AS p_capped
       |  FROM c),
       |a AS (SELECT grp, t_total,
       |    round(CAST(cap_e6 AS DOUBLE) / 1e6, 6) AS cap_tokens,
       |    CASE WHEN capped THEN CAST(cap_e6 AS DOUBLE)
       |      WHEN n_capped = s_all THEN NULL
       |      ELSE CAST(${q198Budget}000000::HUGEINT -
       |          coalesce(p_capped, 0::HUGEINT) AS DOUBLE) /
       |        CAST(s_all - n_capped AS DOUBLE) END AS alloc_e6
       |  FROM f)
       |SELECT grp, t_total AS n_tokens, cap_tokens,
       |  round(alloc_e6 / 1e6, 6) AS alloc_tokens,
       |  round(alloc_e6 / 1e6 / CAST(t_total AS DOUBLE), 6) AS epochs
       |FROM a""".stripMargin

  // ------------------- full curation composition (§2.10 ext)
  // q55 extended to the WHOLE training-set cut the brief describes, as
  // ONE DAG: benchmark holdout (q62's doc_id-mod convention) → quality
  // floor (q30) → raw exact dedup (q9) → normalized dedup keep-min-id
  // (q224's key; texts whose normalized key is EMPTY — e.g. CJK under
  // the latin strip — pass through: the stage cannot speak about them)
  // → near-dup CC keep-representative (q19/q44) → shingle
  // decontamination vs the holdout (q62; docs too short to shingle are
  // vacuously clean) → rebalance to target language shares (q226's
  // hash-keep over the SURVIVOR counts) → token-budget shards (q60).
  // Output = (doc_id, n_tok, shard) of the final cut; every stage's
  // semantics mirror stage-by-stage in the oracle, so stage ORDER and
  // survivor propagation are hash-checked end to end.
  private[queries] lazy val q242Budget = 2000L

  /** Everything before the shard pass — the DAG whose plan the
    * broadcast/no-cartesian assertions inspect ([[q242CurationInner]]'s
    * returned plan is Shard.byBudget's RDD scan, which would pass them
    * vacuously). Same caching contract as [[q55CurationInner]]: callers
    * wrap in their own cleanup scope. */
  private[graft] def q242CurationKept(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val flt = docs
      .filter(col("doc_id") % q62BenchMod =!= 0) // the holdout never trains
      .filter(length(trim(col("text"))) > 0)
      .filter(round(TextExprs.qualityScore(col("text")), 6)
        >= q55QualityFloor)
    val ex1 = Dedup.exactDedup(flt, col("text"), col("doc_id"))
    val normKey = trim(regexp_replace(regexp_replace(
      TextExprs.normalizeText(col("text")), "[^a-z0-9 ]", ""),
      "\\s+", " "))
    val keyed = ex1.withColumn("__nk", normKey)
    val ndd = Dedup.exactDedup(keyed.filter(length(col("__nk")) > 0),
        col("__nk"), col("doc_id"))
      .unionByName(keyed.filter(length(col("__nk")) === 0))
      .drop("__nk")
      .persist() // edges + CC vertices + semijoin + contam read it
    val edges = NearDup.minhashLshPairs(ndd, col("doc_id"), col("text"),
        n = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val reps = graft.operators.DupClusters.connectedComponents(
        ndd.select(col("doc_id").as("id")), edges)
      .filter(col("id") === col("cluster_rep"))
      .select(col("id").as("doc_id"))
    val surv = ndd.join(reps, Seq("doc_id"), "left_semi")
      .persist() // contamination corpus + the clean anti-join
    val contaminated = graft.operators.Contamination.overlapVsBenchmark(
        corpus = surv,
        benchmark = docs.filter(col("doc_id") % q62BenchMod === 0),
        id = col("doc_id"), text = col("text"), n = 3)
      .filter(col("contaminated"))
      .select(col("doc_id"))
    val clean = surv.join(contaminated, Seq("doc_id"), "left_anti")
    val kept = graft.operators.Mix.rebalanceSample(clean, col("doc_id"),
        col("lang"), q226Targets, q226Scale)
      .select(col("id").as("doc_id"))
    clean.join(kept, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        TextExprs.tokenCount(col("text")).cast("long").as("n_tok"))
  }

  private[graft] def q242CurationInner(s: SparkSession, d: String): DataFrame =
    graft.operators.Shard.byBudget(q242CurationKept(s, d),
      "doc_id", "n_tok", q242Budget)

  private[queries] def q242CurationFull(s: SparkSession, d: String): DataFrame =
    graft.operators.CacheHygiene.withRddCleanup(s) {
      graft.operators.CacheHygiene.spillToTempParquet(
        q242CurationInner(s, d), "graft-q242-")
    }

  private[queries] lazy val q242Sql = {
    val z = q226Targets.map(_._2).sum
    val cats = q226Targets.map(t => s"'${t._1}'").mkString(", ")
    val caseTgt = "CASE cat " + q226Targets.map { case (c, sh) =>
      s"WHEN '$c' THEN CAST(${sh / z} AS DOUBLE)"
    }.mkString(" ") + " END"
    val poly = "list_reduce(list_transform(" +
      "string_split(CAST(k.doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    s"""WITH RECURSIVE
       |flt AS (
       |  SELECT doc_id, lang, text FROM documents
       |  WHERE doc_id % $q62BenchMod <> 0 AND length(trim(text)) > 0
       |    AND round(
       |  $qualitySqlBody,
       |  6) >= $q55QualityFloor),
       |ex1 AS (
       |  SELECT doc_id, lang, text FROM (
       |    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |    FROM flt) WHERE rn = 1),
       |nrm AS (SELECT *,
       |    trim(regexp_replace(
       |      regexp_replace(trim(regexp_replace(regexp_replace(
       |        lower(nfc_normalize(text)), '[[:cntrl:]]', ' ', 'g'),
       |        '\\s+', ' ', 'g')), '[^a-z0-9 ]', '', 'g'),
       |      '\\s+', ' ', 'g')) AS nk
       |  FROM ex1),
       |ex AS (
       |  SELECT doc_id, lang, text FROM (
       |    SELECT *, row_number() OVER (PARTITION BY nk ORDER BY doc_id) AS rn
       |    FROM nrm WHERE length(nk) > 0) WHERE rn = 1
       |  UNION ALL
       |  SELECT doc_id, lang, text FROM nrm WHERE length(nk) = 0),
       |${jaccardPairsCteOver("ex")},
       |und AS (
       |  SELECT id_a AS src, id_b AS dst FROM jpairs WHERE jaccard >= 0.8
       |  UNION ALL
       |  SELECT id_b, id_a FROM jpairs WHERE jaccard >= 0.8),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM ex
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN und e ON e.src = reach.id),
       |labels AS (SELECT id, min(r) AS cluster_rep FROM reach GROUP BY id),
       |reps AS (
       |  SELECT ex.doc_id, ex.lang, ex.text FROM ex
       |  JOIN labels ON labels.id = ex.doc_id
       |  WHERE labels.cluster_rep = ex.doc_id),
       |ctoks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM reps),
       |csh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
       |  )) AS s FROM ctoks WHERE len(ts) > 0),
       |btoks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents WHERE doc_id % $q62BenchMod = 0),
       |bsh AS (
       |  SELECT DISTINCT unnest(list_distinct(
       |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
       |  )) AS s FROM btoks WHERE len(ts) > 0),
       |contam AS (
       |  SELECT c.doc_id FROM csh c LEFT JOIN bsh b ON c.s = b.s
       |  GROUP BY c.doc_id HAVING count(b.s) * 2 >= count(*)),
       |keep AS (
       |  SELECT * FROM reps
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       |c AS (SELECT lang AS cat, CAST(count(*) AS BIGINT) AS n
       |  FROM keep WHERE lang IN ($cats) GROUP BY 1),
       |x AS (SELECT cat, n, $caseTgt AS tgt FROM c),
       |tt AS (SELECT min(CAST(n AS DOUBLE) / tgt) AS t FROM x),
       |r AS (SELECT cat, n, tgt, least($q226Scale,
       |    CAST(floor(round(t * tgt / CAST(n AS DOUBLE) * $q226Scale,
       |      6)) AS BIGINT)) AS rate_bp
       |  FROM x CROSS JOIN tt),
       |kept AS (
       |  SELECT k.doc_id, k.text FROM keep k JOIN r ON r.cat = k.lang
       |  WHERE (((($poly * 1103515245 + 12345) % 1000000007) *
       |    2654435761) % 1000000007) % $q226Scale < r.rate_bp),
       |t AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
       |         AS BIGINT) AS n_tok
       |  FROM kept)
       |SELECT doc_id, n_tok,
       |  CAST(coalesce(SUM(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    // $q242Budget AS BIGINT) AS shard
       |FROM t""".stripMargin
  }
}
