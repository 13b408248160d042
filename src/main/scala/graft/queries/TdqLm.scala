package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TimeExprs, VectorExprs}
import graft.operators.{Dedup, NearDup, Similarity}
import graft.sources.Tables

/** LM / tokenizer family: BPE training, n-gram LMs, OOV, Zipf/Heaps, fertility, packing, padding, truncation, span corruption.
  *
  * One domain slice of the query registry (split from the single-file
  * registry in round 15 — same members, same semantics). Members are
  * `private[queries]` so cross-domain references keep working; `val`s
  * became `lazy val`s so initialization is order-independent across the
  * trait mix-in. Mixed into [[TestdataQueries]], which owns the maps.
  */
private[queries] trait TdqLm { this: TestdataQueries.type =>

  // ------------------------------------------- BPE-ish tokens + quality
  private[queries] def q29Bpeish(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextExprs.bpeishTokenCount(col("text")).as("n_bpe"),
      TextExprs.tokenCount(col("text")).as("n_ws"))

  private[queries] lazy val q29Sql = {
    val pat = TextExprs.bpePattern.replace("\\", "\\").replace("'", "''")
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$pat')) AS n_bpe,
       |  CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_ws
       |FROM documents""".stripMargin
  }

  private[queries] def q30Quality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0) // parity with the oracle WHERE
      .select(
        col("doc_id"),
        round(TextExprs.qualityScore(col("text")), 6).as("quality"))

  /** TextExprs.qualityScore mirrored in DuckDB, over a column `text`
    * (shared by q30 and q55's quality-floor stage). */
  private[queries] lazy val qualitySqlBody = {
    val stops = TextExprs.defaultStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""(CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g')) AS DOUBLE)
       |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.4
       |  + least((CAST(len(list_intersect(regexp_split_to_array(trim(lower(text)), '\\s+'), $stops)) AS DOUBLE)
       |           / CAST(greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) AS DOUBLE)) * 5.0, 1.0) * 0.3
       |  + least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.3""".stripMargin
  }

  private[queries] lazy val q30Sql =
    s"""SELECT doc_id, round(
       |  $qualitySqlBody,
       |  6) AS quality
       |FROM documents WHERE length(trim(text)) > 0""".stripMargin

  // ----------------------------- vocab induction + bigram LM (§2.10 ext)
  // One BPE-training merge round (top adjacent-pair counts, distributed
  // top-k) and the per-doc bigram-MLE NLL quality signal built from the
  // same pair stream. Shared CTEs on the oracle side mirror the shared
  // explode on the Spark side.
  private[queries] lazy val q71TopK = 20

  private[queries] def q71BpePairs(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.topPairs(
      Tables.documents(s, d), col("text"), q71TopK)

  private[queries] lazy val q71TokensCte =
    """WITH toks AS (
      |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |       ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
      |  FROM documents)""".stripMargin

  private[queries] lazy val q71PairsCte =
    s"""$q71TokensCte,
       |pairs AS (
       |  SELECT doc_id, ts[i] AS l_tok, ts[i + 1] AS r_tok
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks))""".stripMargin

  private[queries] lazy val q71Sql =
    s"""$q71PairsCte,
       |cnt AS (SELECT l_tok, r_tok, count(*) AS n FROM pairs GROUP BY 1, 2),
       |r AS (SELECT l_tok, r_tok, n, row_number() OVER (
       |        ORDER BY n DESC, l_tok, r_tok) AS rank FROM cnt)
       |SELECT CAST(rank AS INTEGER) AS rank, l_tok, r_tok, n
       |FROM r WHERE rank <= $q71TopK""".stripMargin

  private[queries] def q72BigramNll(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.bigramNll(
      Tables.documents(s, d), col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")

  private[queries] lazy val q72Sql =
    s"""$q71PairsCte,
       |cnt AS (SELECT l_tok, r_tok, count(*) AS c_lr FROM pairs GROUP BY 1, 2),
       |cl AS (SELECT l_tok, r_tok, c_lr,
       |      sum(c_lr) OVER (PARTITION BY l_tok) AS c_l FROM cnt),
       |sc AS (SELECT p.doc_id, ln(CAST(c_lr AS DOUBLE) / CAST(c_l AS DOUBLE)) AS ll
       |       FROM pairs p JOIN cl USING (l_tok, r_tok))
       |SELECT doc_id, count(*) AS n_bigrams,
       |  round(-sum(ll) / count(*), 4) AS avg_nll
       |FROM sc GROUP BY doc_id""".stripMargin

  // ----------------------------- sequence packing (§2.10 ext)
  // Fixed-length training-example assembly: distributed prefix offsets
  // (Shard.byBudget, unit budget) + map-side span explode. The oracle IS
  // the single-task running-sum window the operator avoids.
  private[queries] lazy val q74SeqLen = 128

  private[queries] def q74PackExamples(s: SparkSession, d: String): DataFrame =
    graft.operators.Pack.packExamples(
      Tables.documents(s, d)
        .select(col("doc_id"), TextExprs.tokenCount(col("text")).as("n_toks")),
      "doc_id", "n_toks", q74SeqLen)
      .select(col("doc_id"), col("example_id"), col("tok_start"), col("tok_len"))

  private[queries] lazy val q74Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |       ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |t AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS w FROM toks),
       |o AS (SELECT doc_id, w, CAST(coalesce(sum(w) OVER (ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |      FROM t),
       |e AS (SELECT doc_id, w, off,
       |        unnest(range(off // $q74SeqLen, (off + w - 1) // $q74SeqLen + 1)) AS example_id
       |      FROM o WHERE w > 0)
       |SELECT doc_id, example_id,
       |  CAST(greatest(0, example_id * $q74SeqLen - off) AS BIGINT) AS tok_start,
       |  CAST(least(w, (example_id + 1) * $q74SeqLen - off)
       |    - greatest(0, example_id * $q74SeqLen - off) AS BIGINT) AS tok_len
       |FROM e""".stripMargin

  // ----------------------------- multi-round BPE training (§2.10 ext)
  // K full merge rounds with pair re-derivation over the merged token
  // sequences — the real tokenizer-training loop (Sennrich et al. 2016),
  // not just round 1's counts (q71). The oracle replays every round as an
  // unrolled CTE chain on the wrapped-string form: tokens bracketed by
  // chr(1)/chr(2) make one standard `replace` the exact greedy
  // left-to-right non-overlapping merge in BOTH engines.
  private[queries] lazy val q82Rounds = 8

  private[queries] def q82BpeTrain(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.bpeTrain(
      Tables.documents(s, d), col("text"), q82Rounds)

  /** The unrolled K-round CTE chain shared by q82 (training output = the
    * m_i merge rows) and q83 (encoding output = the r_K merged strings,
    * carrying doc_id and the raw token count through every round). */
  private[queries] lazy val q82Ctes = {
    val w1 = "chr(1)"; val w2 = "chr(2)"
    val roundCtes = (1 to q82Rounds).map { i =>
      s"""p$i AS (
         |  SELECT ts[j] AS l_tok, ts[j + 1] AS r_tok
         |  FROM (SELECT ts, unnest(range(1, len(ts))) AS j
         |        FROM (SELECT string_split(substr(s, 2, length(s) - 2),
         |                       $w2 || $w1) AS ts FROM r${i - 1}))),
         |m$i AS (
         |  SELECT l_tok, r_tok, count(*) AS n FROM p$i GROUP BY 1, 2
         |  ORDER BY n DESC, l_tok, r_tok LIMIT 1),
         |r$i AS (
         |  SELECT doc_id, n_raw,
         |    coalesce(replace(s, $w1 || l_tok || $w2 || $w1 || r_tok || $w2,
         |                     $w1 || l_tok || r_tok || $w2), s) AS s
         |  FROM r${i - 1} LEFT JOIN m$i ON true)""".stripMargin
    }.mkString(",\n")
    s"""WITH d0 AS (
       |  SELECT doc_id,
       |    trim(regexp_replace(text, '[' || $w1 || $w2 || ']', ' ', 'g')) AS t
       |  FROM documents),
       |r0 AS (
       |  SELECT doc_id,
       |    len(regexp_split_to_array(t, '\\s+')) AS n_raw,
       |    $w1 || array_to_string(
       |      regexp_split_to_array(t, '\\s+'), $w2 || $w1)
       |    || $w2 AS s
       |  FROM d0 WHERE length(t) > 0),
       |$roundCtes""".stripMargin
  }

  private[queries] lazy val q82Sql = {
    val unioned = (1 to q82Rounds)
      .map(i => s"SELECT $i AS round, l_tok, r_tok, n FROM m$i")
      .mkString("\n  UNION ALL ")
    // q82Ctes is already margin-stripped — re-stripping would eat the
    // leading "||" continuation lines down to a single "|"
    q82Ctes + "\nSELECT CAST(round AS INTEGER) AS round, l_tok, r_tok, n " +
      s"FROM (\n  $unioned)"
  }

  private[queries] def q83BpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = graft.operators.Vocab
      .bpeTrain(docs, col("text"), q82Rounds)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.operators.Vocab.bpeEncode(docs, col("doc_id"), col("text"), merges)
      .withColumnRenamed("id", "doc_id")
  }

  private[queries] lazy val q83Sql =
    q82Ctes + s"""
SELECT doc_id, CAST(n_raw AS BIGINT) AS n_raw,
  CAST(length(s) - length(replace(s, chr(1), '')) AS BIGINT) AS n_bpe,
  round(CAST(n_raw AS DOUBLE) /
        (length(s) - length(replace(s, chr(1), ''))), 4) AS compression
FROM r$q82Rounds"""

  // ----------------------------- trigram LM scoring (§2.10 ext)
  // q72's fluency signal with one more token of context and add-k
  // (Lidstone) smoothing: P(w3|w1,w2) = (c3 + k) / (c2 + k*V). The
  // oracle replays the exact formula including the corpus vocab size V.
  private[queries] def q90TrigramNll(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.trigramNll(
      Tables.documents(s, d), col("doc_id"), col("text"), addK = 0.5)
      .withColumnRenamed("id", "doc_id")

  private[queries] lazy val q90Sql =
    s"""$q71TokensCte,
       |tri AS (
       |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM toks)),
       |cnt AS (SELECT w1, w2, w3, count(*) AS c3 FROM tri GROUP BY 1, 2, 3),
       |cc AS (SELECT w1, w2, w3, c3,
       |         sum(c3) OVER (PARTITION BY w1, w2) AS c2 FROM cnt),
       |voc AS (SELECT count(DISTINCT t) AS v
       |        FROM (SELECT unnest(ts) AS t FROM toks)),
       |sc AS (SELECT t.doc_id,
       |         ln((c3 + 0.5) / (c2 + 0.5 * v)) AS ll
       |       FROM tri t JOIN cc USING (w1, w2, w3) CROSS JOIN voc)
       |SELECT doc_id, count(*) AS n_trigrams,
       |  round(-sum(ll) / count(*), 4) AS avg_nll
       |FROM sc GROUP BY doc_id""".stripMargin

  // ----------------------------- stupid-backoff LM scoring (§2.10 ext)
  // Brants et al. 2007: the distributed-count-table LM. Held-out docs
  // (doc_id % 5 = 0) are scored against tables built from the REST of the
  // corpus, so unseen n-grams occur and every backoff level fires. The
  // oracle replays the exact three-level formula; fixture doc_ids are
  // non-negative, so `%` and Spark's pmod agree on the split.
  private[queries] def q98StupidBackoff(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.stupidBackoffNll(
      Tables.documents(s, d), col("doc_id"), col("text"),
      alpha = 0.4, heldMod = 5)
      .withColumnRenamed("id", "doc_id")

  private[queries] lazy val q98Sql = {
    val a  = "0.4"
    val a2 = (0.4 * 0.4).toString // the exact double Spark computes
    s"""$q71TokensCte,
       |train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
       |held  AS (SELECT * FROM toks WHERE doc_id % 5 = 0),
       |ttri AS (
       |  SELECT ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
       |  FROM (SELECT ts, unnest(range(1, len(ts) - 1)) AS i FROM train)),
       |c3t AS (SELECT w1, w2, w3, count(*) AS c3 FROM ttri GROUP BY 1, 2, 3),
       |c3c AS (SELECT w1, w2, w3, c3,
       |          sum(c3) OVER (PARTITION BY w1, w2) AS c2 FROM c3t),
       |tbi AS (
       |  SELECT ts[i] AS w2, ts[i + 1] AS w3
       |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM train)),
       |bic AS (SELECT w2, w3, c_br, sum(c_br) OVER (PARTITION BY w2) AS c_bl
       |        FROM (SELECT w2, w3, count(*) AS c_br FROM tbi GROUP BY 1, 2)),
       |uni AS (SELECT t AS w3, count(*) AS c1
       |        FROM (SELECT unnest(ts) AS t FROM train) GROUP BY 1),
       |st AS (SELECT sum(c1) AS n_tok, count(*) AS v FROM uni),
       |htri AS (
       |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM held)),
       |sc AS (SELECT h.doc_id, ln(CASE
       |         WHEN c3 IS NOT NULL THEN CAST(c3 AS DOUBLE) / c2
       |         WHEN c_br IS NOT NULL THEN $a * CAST(c_br AS DOUBLE) / c_bl
       |         ELSE $a2 * CAST(COALESCE(c1, 0) + 1 AS DOUBLE) / (n_tok + v)
       |       END) AS ll
       |       FROM htri h
       |       LEFT JOIN c3c USING (w1, w2, w3)
       |       LEFT JOIN bic USING (w2, w3)
       |       LEFT JOIN uni USING (w3)
       |       CROSS JOIN st)
       |SELECT doc_id, count(*) AS n_trigrams,
       |  round(-sum(ll) / count(*), 4) AS avg_nll
       |FROM sc GROUP BY doc_id""".stripMargin
  }

  // ----------------------------- CCNet perplexity buckets (§2.10 ext)
  // Wenzek et al. 2020: score every doc with the corpus LM (q90's add-k
  // trigram NLL), cut the corpus into head/middle/tail at the NLL
  // terciles, assign map-side. The tercile boundaries come from the
  // k-bounded quantile sketch (q67's portable-hash sample — NEVER a
  // global sort/window over the corpus), broadcast as one row; the oracle
  // replays LM, sample, rank-picks, and the bucket CASE end-to-end.
  private[queries] def q102CcnetBuckets(s: SparkSession, d: String): DataFrame = {
    val scored = graft.operators.Vocab.trigramNll(
        Tables.documents(s, d), col("doc_id"), col("text"), addK = 0.5)
      .withColumnRenamed("id", "doc_id")
    val qs = graft.operators.Sketch.quantileSketch(scored, col("avg_nll"),
      col("doc_id"), q67K, Seq(1.0 / 3, 2.0 / 3))
    // two rank-picks → one (t1 ≤ t2) boundary row riding the plan
    val bounds = qs.agg(min(col("est_value")).as("t1"),
      max(col("est_value")).as("t2"))
    scored.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("avg_nll"),
        when(col("avg_nll") <= col("t1"), "head")
          .when(col("avg_nll") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  private[queries] lazy val q102Sql = {
    val raw = "list_reduce(list_transform(string_split(" +
      "CAST(doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val h = s"((($raw * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    val vals = Seq(1.0 / 3, 2.0 / 3)
      .map(p => s"(CAST($p AS DOUBLE))").mkString(", ")
    s"""$q71TokensCte,
       |tri AS (
       |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM toks)),
       |cnt AS (SELECT w1, w2, w3, count(*) AS c3 FROM tri GROUP BY 1, 2, 3),
       |cc AS (SELECT w1, w2, w3, c3,
       |         sum(c3) OVER (PARTITION BY w1, w2) AS c2 FROM cnt),
       |voc AS (SELECT count(DISTINCT t) AS v
       |        FROM (SELECT unnest(ts) AS t FROM toks)),
       |lsc AS (SELECT t.doc_id,
       |         ln((c3 + 0.5) / (c2 + 0.5 * v)) AS ll
       |       FROM tri t JOIN cc USING (w1, w2, w3) CROSS JOIN voc),
       |nll AS (SELECT doc_id, round(-sum(ll) / count(*), 4) AS avg_nll
       |        FROM lsc GROUP BY doc_id),
       |hv AS (SELECT DISTINCT $h AS h, CAST(avg_nll AS DOUBLE) AS v FROM nll),
       |sel AS (SELECT h, v, row_number() OVER (ORDER BY h, v) AS rn FROM hv
       |        QUALIFY rn <= $q67K),
       |s AS (SELECT v, row_number() OVER (ORDER BY v, h) AS qrn FROM sel),
       |n AS (SELECT max(qrn) AS n_sample FROM s),
       |picks AS (
       |  SELECT s.v FROM (VALUES $vals) p(prob)
       |  CROSS JOIN n
       |  JOIN s ON s.qrn = CAST(ceil(p.prob * n.n_sample) AS INTEGER)),
       |b AS (SELECT min(v) AS t1, max(v) AS t2 FROM picks)
       |SELECT nll.doc_id, nll.avg_nll,
       |  CASE WHEN avg_nll <= t1 THEN 'head'
       |       WHEN avg_nll <= t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM nll CROSS JOIN b""".stripMargin
  }

  // ----------------------------- Kneser–Ney bigram LM (§2.10 ext)
  // Interpolated KN with one absolute discount D=0.75: the
  // standard-smoothing rung above stupid backoff — continuation counts
  // (distinct contexts) instead of raw frequency in the backoff term.
  private[queries] def q111KnNll(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.kneserNeyNll(
      Tables.documents(s, d), col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")

  private[queries] lazy val q111Sql =
    s"""$q71PairsCte,
       |cnt AS (SELECT l_tok, r_tok, count(*) AS c_lr FROM pairs GROUP BY 1, 2),
       |tab AS (SELECT l_tok, r_tok, c_lr,
       |    sum(c_lr) OVER (PARTITION BY l_tok) AS c_l,
       |    count(*) OVER (PARTITION BY l_tok) AS n1p_l,
       |    count(*) OVER (PARTITION BY r_tok) AS n1p_r
       |  FROM cnt),
       |tot AS (SELECT count(*) AS n1p_all FROM cnt),
       |sc AS (SELECT p.doc_id, ln(
       |    greatest(CAST(c_lr AS DOUBLE) - 0.75, 0.0) / c_l +
       |    0.75 * n1p_l / c_l * (CAST(n1p_r AS DOUBLE) / n1p_all)) AS ll
       |  FROM pairs p JOIN tab USING (l_tok, r_tok) CROSS JOIN tot)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  round(-sum(ll) / count(*), 4) AS avg_nll
       |FROM sc GROUP BY doc_id""".stripMargin

  // ----------------------------- tokenizer fertility datasheet (§2.10 ext)
  // Chars-per-pretoken and pretokens-per-word per source: how a BPE-ish
  // vocabulary segments each slice (high fertility = the tokenizer
  // fragments that source; the datasheet panel behind per-language token
  // budgeting). Integer sums + two rounded ratios.
  private[queries] def q118Fertility(s: SparkSession, d: String): DataFrame = {
    val t = graft.functions.TextExprs
    Tables.documents(s, d)
      .select(col("source").as("grp"), length(col("text")).cast("long").as("n_chars"),
        t.bpeishTokenCount(col("text")).cast("long").as("n_bpe"),
        t.tokenCount(col("text")).cast("long").as("n_ws"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        sum(col("n_bpe")).as("n_bpe"), sum(col("n_ws")).as("n_ws"))
      .select(col("grp"), col("n_docs"), col("n_chars"), col("n_bpe"),
        col("n_ws"),
        round(col("n_chars").cast("double") /
          greatest(col("n_bpe"), lit(1L)).cast("double"), 4)
          .as("chars_per_bpe"),
        round(col("n_bpe").cast("double") /
          greatest(col("n_ws"), lit(1L)).cast("double"), 4)
          .as("bpe_per_word"))
  }

  private[queries] lazy val q118Sql = {
    val pat = TextExprs.bpePattern.replace("'", "''")
    s"""WITH d AS (
       |  SELECT source AS grp, length(text) AS n_chars,
       |    len(regexp_extract_all(text, '$pat')) AS n_bpe,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_ws
       |  FROM documents)
       |SELECT grp, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe,
       |  CAST(sum(n_ws) AS BIGINT) AS n_ws,
       |  round(CAST(sum(n_chars) AS DOUBLE) /
       |        CAST(greatest(sum(n_bpe), 1) AS DOUBLE), 4) AS chars_per_bpe,
       |  round(CAST(sum(n_bpe) AS DOUBLE) /
       |        CAST(greatest(sum(n_ws), 1) AS DOUBLE), 4) AS bpe_per_word
       |FROM d GROUP BY grp""".stripMargin
  }

  // ------------------- unigram-LM Viterbi scoring (§2.10 ext)
  // SentencePiece-style inference: best additive-piece segmentation per
  // word, integer 1e-6 fixed-point DP — exact in both engines, so the
  // oracle's list_reduce fold and the engine's aggregate HOF replay the
  // identical scores despite different expression shapes. DP runs on
  // the distinct-token TYPE table; the corpus pays a token hash join.
  private[queries] lazy val q131Vocab: Seq[(String, Long)] = Seq(
    "the" -> -2500000L, "ing" -> -2800000L, "and" -> -2900000L,
    "ion" -> -3000000L, "ent" -> -3200000L, "for" -> -3400000L,
    "th" -> -3000000L, "he" -> -3200000L, "in" -> -3100000L,
    "er" -> -3200000L, "an" -> -3300000L, "re" -> -3400000L,
    "on" -> -3400000L, "at" -> -3500000L, "en" -> -3500000L,
    "nd" -> -3600000L, "es" -> -3600000L, "or" -> -3700000L,
    "e" -> -3900000L, "t" -> -4000000L, "a" -> -4000000L)
  private[queries] lazy val q131CharScore = -4200000L
  private[queries] lazy val q131MaxPiece = 3

  private[queries] def q131UnigramNll(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.unigramNll(Tables.documents(s, d),
      col("doc_id"), col("text"), q131Vocab, q131CharScore, q131MaxPiece)
      .select(col("id").as("doc_id"), col("n_tokens"), col("nll_e6"))

  private[queries] lazy val q131Sql = {
    val sentinel = (Long.MinValue / 4).toString
    def caseScore(j: Int, pos: String): String = {
      val entries = q131Vocab.filter(_._1.length == j)
      if (entries.isEmpty) "CAST(NULL AS BIGINT)"
      else s"CASE substr(tok, CAST($pos AS INT), $j) " +
        entries.map { case (piece, sc) =>
          s"WHEN '$piece' THEN CAST($sc AS BIGINT)" }.mkString(" ") + " END"
    }
    val cands = (1 to q131MaxPiece).map { j =>
      val pos = s"x[1]-${j - 1}"
      val sc =
        if (j == 1)
          s"coalesce(${caseScore(1, pos)}, CAST($q131CharScore AS BIGINT))"
        else caseScore(j, pos)
      if (j == 1) s"acc[CAST($pos AS INT)] + ($sc)"
      else
        s"CASE WHEN x[1] >= $j AND ($sc) IS NOT NULL " +
          s"THEN acc[CAST($pos AS INT)] + ($sc) " +
          s"ELSE CAST($sentinel AS BIGINT) END"
    }
    s"""WITH tk AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents WHERE length(trim(text)) > 0),
       |dt AS (SELECT DISTINCT tok FROM tk),
       |dp AS (SELECT tok,
       |    list_reduce(
       |      list_concat([[CAST(0 AS BIGINT)]],
       |        list_transform(range(1, len(tok) + 1), i -> [i])),
       |      (acc, x) -> list_append(acc,
       |        greatest(${cands.mkString(",\n          ")}))) AS bs
       |  FROM dt),
       |sc AS (SELECT tok, bs[len(tok) + 1] AS s FROM dp)
       |SELECT tk.doc_id, count(*) AS n_tokens, CAST(sum(-s) AS BIGINT) AS nll_e6
       |FROM tk JOIN sc USING (tok) GROUP BY tk.doc_id""".stripMargin
  }

  // ------------------- span-corruption masking (§2.10 ext)
  // T5-style denoising example generation as a reproducible pipeline
  // stage: block-aligned mask spans decided by the portable hash of
  // (doc_id, block) — no RNG; the oracle replays the full masked text.
  private[queries] lazy val q132Block = 4
  private[queries] lazy val q132Denom = 5

  private[queries] def q132SpanCorrupt(s: SparkSession, d: String): DataFrame =
    graft.operators.Mask.spanCorrupt(Tables.documents(s, d),
      col("doc_id"), col("text"), q132Block, q132Denom)
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_masked"),
        col("masked_text"))

  private[queries] lazy val q132Sql = {
    val key = s"CAST(doc_id AS VARCHAR) || '|' || " +
      s"CAST((i - 1) // $q132Block AS VARCHAR)"
    val poly = s"list_reduce(list_transform(string_split($key, ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val cond = s"((($poly * 1103515245 + 12345) % 1000000007) * " +
      s"2654435761) % 1000000007 % $q132Denom = 0"
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents)
       |SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(ts, (t, i) -> $cond)) AS BIGINT) AS n_masked,
       |  array_to_string(list_transform(ts, (t, i) ->
       |    CASE WHEN $cond THEN '<mask>' ELSE t END), ' ') AS masked_text
       |FROM tk""".stripMargin
  }

  // ------------------- padding-overhead audit (§2.10 ext)
  // Padded-batch cost of hashed vs length-bucketed batching on the same
  // corpus — the audit that justifies bucketing WITHOUT a corpus sort.
  // Batch assignment is the oracle-portable LCG mix, so both engines
  // agree on every batch; all arithmetic is exact integers until the
  // final ratio.
  private[queries] lazy val q193BatchRows = 32
  private[queries] lazy val q193BucketWidth = 16

  private[queries] def q193PaddingOverhead(s: SparkSession, d: String): DataFrame =
    graft.operators.Pack.paddingOverhead(
      Tables.documents(s, d).select(col("doc_id"),
        size(graft.functions.TextExprs.tokens(col("text"))).as("nt")),
      col("doc_id"), col("nt"), q193BatchRows, q193BucketWidth)

  private[queries] lazy val q193Sql =
    s"""WITH base AS (SELECT doc_id AS id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt
       |  FROM documents),
       |hx AS (SELECT id, CAST(nt AS BIGINT) AS nt,
       |    (id * 1103515245 + 12345) % 2147483647 AS h FROM base),
       |n AS (SELECT count(*) AS n FROM base),
       |hb AS (SELECT nt, h % greatest(1,
       |      CAST(ceil(CAST(n AS DOUBLE) / $q193BatchRows) AS BIGINT)) AS b
       |  FROM hx CROSS JOIN n),
       |hsum AS (SELECT b, count(*) AS nrows, sum(nt) AS realt, max(nt) AS mx
       |  FROM hb GROUP BY b),
       |hrow AS (SELECT 'hashed' AS strategy,
       |    CAST(count(*) AS BIGINT) AS n_batches,
       |    CAST(sum(realt) AS BIGINT) AS real_tokens,
       |    CAST(sum(mx * nrows) AS BIGINT) AS padded_tokens FROM hsum),
       |bx AS (SELECT id, nt, h, nt // $q193BucketWidth AS lb FROM hx),
       |bs AS (SELECT lb, count(*) AS cb FROM bx GROUP BY lb),
       |bb AS (SELECT nt, lb, h % greatest(1,
       |      CAST(ceil(CAST(cb AS DOUBLE) / $q193BatchRows) AS BIGINT)) AS b
       |  FROM bx JOIN bs USING (lb)),
       |bsum AS (SELECT lb, b, count(*) AS nrows, sum(nt) AS realt,
       |    max(nt) AS mx FROM bb GROUP BY lb, b),
       |brow AS (SELECT 'bucketed' AS strategy,
       |    CAST(count(*) AS BIGINT) AS n_batches,
       |    CAST(sum(realt) AS BIGINT) AS real_tokens,
       |    CAST(sum(mx * nrows) AS BIGINT) AS padded_tokens FROM bsum)
       |SELECT strategy, n_batches, real_tokens, padded_tokens,
       |  round(CAST(padded_tokens - real_tokens AS DOUBLE) /
       |    CAST(real_tokens AS DOUBLE), 6) AS overhead_ratio
       |FROM (SELECT * FROM hrow UNION ALL SELECT * FROM brow)""".stripMargin

  // ------------------- OOV rate under a min-frequency vocab (§2.10 ext)
  // Tokenizer-coverage audit: per source, the fraction of token
  // occurrences whose corpus-wide count is below the trainer's
  // min_frequency cut. Count-table composition only — no top-k vocab
  // ordering anywhere.
  private[queries] lazy val q195MinCount = 5L

  private[queries] def q195OovRate(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.oovRateByGroup(Tables.documents(s, d),
      col("source"), col("text"), q195MinCount)

  private[queries] lazy val q195Sql =
    s"""WITH toks AS (SELECT source AS grp, unnest(
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS t
       |  FROM documents),
       |st AS (SELECT grp, t, CAST(count(*) AS BIGINT) AS cnt
       |  FROM toks GROUP BY 1, 2),
       |tot AS (SELECT t, CAST(sum(cnt) AS BIGINT) AS tot FROM st GROUP BY 1)
       |SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN tot < $q195MinCount THEN cnt ELSE 0 END)
       |    AS BIGINT) AS oov_tokens,
       |  round(CAST(sum(CASE WHEN tot < $q195MinCount THEN cnt ELSE 0 END)
       |      AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS oov_rate
       |FROM st JOIN tot USING (t) GROUP BY grp""".stripMargin

  // ------------------- vocab concentration panel (§2.10 ext)
  // Per-source corpus-health numbers beside the Zipf slope: hapax
  // share, ties-inclusive top-10 token mass, Gini of the count
  // distribution. Everything past the count shuffle runs on the
  // (grp, cnt) distinct-frequency table; Gini's rank-weighted sum is
  // division-free decimal integer arithmetic.
  private[queries] def q210Concentration(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.concentrationByGroup(Tables.documents(s, d),
      col("source"), col("text"))

  private[queries] lazy val q210Sql =
    """WITH toks AS (SELECT source AS grp, unnest(
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\s+') END) AS t
      |  FROM documents),
      |stc AS (SELECT grp, t, CAST(count(*) AS BIGINT) AS cnt
      |  FROM toks GROUP BY 1, 2),
      |bc AS (SELECT grp, cnt, CAST(count(*) AS BIGINT) AS n_types
      |  FROM stc GROUP BY 1, 2),
      |blk AS (SELECT grp, cnt, n_types,
      |    sum(n_types) OVER (PARTITION BY grp ORDER BY cnt DESC
      |      ROWS UNBOUNDED PRECEDING) - n_types + 1 AS min_rank,
      |    CAST(sum(n_types) OVER (PARTITION BY grp ORDER BY cnt ASC
      |      ROWS UNBOUNDED PRECEDING) - n_types AS HUGEINT) AS r0
      |  FROM bc),
      |agg AS (SELECT grp,
      |    CAST(sum(n_types) AS BIGINT) AS n_types,
      |    CAST(sum(CAST(cnt AS HUGEINT) * n_types) AS HUGEINT) AS n_tok,
      |    CAST(sum(CASE WHEN cnt = 1 THEN n_types ELSE 0 END) AS BIGINT)
      |      AS hapax_types,
      |    CAST(sum(CASE WHEN min_rank <= 10
      |        THEN CAST(cnt AS HUGEINT) * n_types ELSE 0 END) AS HUGEINT)
      |      AS top_mass,
      |    CAST(sum(CAST(cnt AS HUGEINT) *
      |        (2 * CAST(n_types AS HUGEINT) * r0 +
      |         CAST(n_types AS HUGEINT) * (n_types + 1))) AS HUGEINT)
      |      AS s_rw2
      |  FROM blk GROUP BY 1)
      |SELECT grp, n_types, CAST(n_tok AS BIGINT) AS n_tokens,
      |  hapax_types,
      |  round(CAST(hapax_types AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
      |    AS hapax_share,
      |  round(CAST(top_mass AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
      |    AS top10_mass,
      |  round((CAST(s_rw2 AS DOUBLE) -
      |      (CAST(n_types AS DOUBLE) + 1) * CAST(n_tok AS DOUBLE)) /
      |    (CAST(n_types AS DOUBLE) * CAST(n_tok AS DOUBLE)), 6) AS gini
      |FROM agg""".stripMargin

  // ------------------- Heaps'-law fit (§2.10 ext)
  // Vocabulary-growth health: OLS of (ln N, ln V) across the per-source
  // points — slope is Heaps' β (natural text ≈ 0.4–0.6). Points are one
  // row per source off the count table; shared decimal-exact OLS tail.
  private[queries] def q211HeapsFit(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.heapsFitByGroup(Tables.documents(s, d),
      col("source"), col("text"))

  private[queries] lazy val q211Sql = olsSqlOver(
    """WITH toks AS (SELECT source AS src, unnest(
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\s+') END) AS t
      |  FROM documents),
      |stc AS (SELECT src, t, CAST(count(*) AS BIGINT) AS cnt
      |  FROM toks GROUP BY 1, 2),
      |g AS (SELECT src, CAST(count(*) AS BIGINT) AS v,
      |    CAST(sum(cnt) AS BIGINT) AS nt
      |  FROM stc GROUP BY 1),
      |base AS (SELECT 'all' AS grp,
      |    CAST(round(ln(CAST(nt AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |    CAST(round(ln(CAST(v AS DOUBLE)) * 1e6) AS BIGINT) AS y
      |  FROM g)""".stripMargin)

  // ------------------- unigram entropy / effective vocab (§2.10 ext)
  // The concentration panel's information-theoretic sibling: H and
  // exp(H) per source off the same count table; the Σ cnt·ln(cnt) runs
  // on the distinct-frequency table with snapped lns in decimal.
  private[queries] def q219Entropy(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.entropyByGroup(Tables.documents(s, d),
      col("source"), col("text"))

  private[queries] lazy val q219Sql =
    """WITH toks AS (SELECT source AS grp, unnest(
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\s+') END) AS t
      |  FROM documents),
      |stc AS (SELECT grp, t, CAST(count(*) AS BIGINT) AS cnt
      |  FROM toks GROUP BY 1, 2),
      |bc AS (SELECT grp, cnt, CAST(count(*) AS BIGINT) AS n_types
      |  FROM stc GROUP BY 1, 2),
      |agg AS (SELECT grp,
      |    CAST(sum(n_types) AS BIGINT) AS n_types,
      |    CAST(sum(CAST(cnt AS HUGEINT) * n_types) AS BIGINT)
      |      AS n_tokens,
      |    CAST(sum((CAST(cnt AS HUGEINT) * n_types) *
      |      CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT))
      |      AS HUGEINT) AS s6
      |  FROM bc GROUP BY 1)
      |SELECT grp, n_tokens, n_types,
      |  round(ln(CAST(n_tokens AS DOUBLE)) -
      |    CAST(s6 AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE), 6)
      |    AS entropy,
      |  round(exp(ln(CAST(n_tokens AS DOUBLE)) -
      |    CAST(s6 AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE)), 6)
      |    AS eff_vocab
      |FROM agg""".stripMargin

  // ------------------- prefix-LM split (§2.10 ext)
  // UL2 S-denoiser example generation: hash-derived interior pivot, both
  // sides non-empty, no RNG — the oracle replays both texts in full.
  private[queries] def q217PrefixLm(s: SparkSession, d: String): DataFrame =
    graft.operators.Mask.prefixLmSplit(Tables.documents(s, d),
      col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")

  private[queries] lazy val q217Sql = {
    val poly = "list_reduce(list_transform(" +
      "string_split(CAST(doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    s"""WITH tk AS (SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |f AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n
       |      FROM tk WHERE len(ts) >= 2),
       |p AS (SELECT doc_id, ts, n,
       |    (((($poly * 1103515245 + 12345) % 1000000007) *
       |      2654435761) % 1000000007) % (n - 1) + 1 AS il
       |  FROM f)
       |SELECT doc_id, n AS n_tokens, il AS input_len,
       |  n - il AS target_len,
       |  array_to_string(array_slice(ts, 1, il), ' ') AS input_text,
       |  array_to_string(array_slice(ts, il + 1, n), ' ') AS target_text
       |FROM p""".stripMargin
  }

  // ------------------- truncation sweep (§2.10 ext)
  // q206's audit over the CANDIDATE window sizes seq_len is picked
  // from, in ONE corpus scan: the lengths explode from a plan literal
  // onto the token-count metadata row, never the text.
  private[queries] lazy val q213SeqLens = Seq(32, 64, 128, 256)

  private[queries] def q213TruncationSweep(s: SparkSession, d: String): DataFrame =
    graft.operators.Pack.truncationSweep(Tables.documents(s, d),
      graft.functions.TextExprs.tokenCount(col("text")), q213SeqLens)

  private[queries] lazy val q213Sql =
    s"""WITH base AS (SELECT CAST(
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
       |    AS BIGINT) AS nt
       |  FROM documents),
       |e AS (SELECT nt, CAST(unnest([${q213SeqLens.mkString(", ")}])
       |    AS BIGINT) AS seq_len FROM base)
       |SELECT seq_len, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN nt > seq_len THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_truncated,
       |  CAST(sum(nt) AS BIGINT) AS total_tokens,
       |  CAST(sum(greatest(nt - seq_len, 0)) AS BIGINT) AS lost_tokens,
       |  round(CAST(sum(CASE WHEN nt > seq_len THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS trunc_share,
       |  CASE WHEN sum(nt) = 0 THEN NULL
       |    ELSE round(CAST(sum(greatest(nt - seq_len, 0)) AS DOUBLE) /
       |      CAST(sum(nt) AS DOUBLE), 6) END AS lost_share
       |FROM e GROUP BY seq_len""".stripMargin

  // ------------------- Zipf rank-frequency slope (§2.10 ext)
  // Corpus-health scalar per source: the log-log rank-frequency slope
  // (natural text ≈ -1). One point per DISTINCT frequency (tie-group
  // min-rank), snapped lns, then the shared decimal-exact OLS tail.
  private[queries] def q205ZipfSlope(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.zipfSlopeByGroup(Tables.documents(s, d),
      col("source"), col("text"))

  private[queries] lazy val q205Sql = olsSqlOver(
    """WITH toks AS (SELECT source AS grp, unnest(
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\s+') END) AS t
      |  FROM documents),
      |stc AS (SELECT grp, t, CAST(count(*) AS BIGINT) AS cnt
      |  FROM toks GROUP BY 1, 2),
      |bc AS (SELECT grp, cnt, CAST(count(*) AS BIGINT) AS n_types
      |  FROM stc GROUP BY 1, 2),
      |base AS (SELECT grp,
      |    CAST(round(ln(CAST(sum(n_types) OVER (PARTITION BY grp
      |        ORDER BY cnt DESC ROWS UNBOUNDED PRECEDING)
      |      - n_types + 1 AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |    CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT) AS y
      |  FROM bc)""".stripMargin)

  // ------------------- truncation-loss audit (§2.10 ext)
  // The pre-seq_len question: per source, how many docs exceed the
  // window and how much token mass hard truncation throws away. Map-side
  // arithmetic, one groups-sized aggregate.
  private[queries] lazy val q206SeqLen = 64

  private[queries] def q206TruncationLoss(s: SparkSession, d: String): DataFrame =
    graft.operators.Pack.truncationLoss(Tables.documents(s, d),
      col("source"),
      graft.functions.TextExprs.tokenCount(col("text")), q206SeqLen)

  private[queries] lazy val q206Sql =
    s"""WITH base AS (SELECT source AS grp, CAST(
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
       |    AS BIGINT) AS nt
       |  FROM documents)
       |SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN nt > $q206SeqLen THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_truncated,
       |  CAST(sum(nt) AS BIGINT) AS total_tokens,
       |  CAST(sum(greatest(nt - $q206SeqLen, 0)) AS BIGINT)
       |    AS lost_tokens,
       |  round(CAST(sum(CASE WHEN nt > $q206SeqLen THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS trunc_share,
       |  CASE WHEN sum(nt) = 0 THEN NULL
       |    ELSE round(CAST(sum(greatest(nt - $q206SeqLen, 0)) AS DOUBLE) /
       |      CAST(sum(nt) AS DOUBLE), 6) END AS lost_share
       |FROM base GROUP BY grp""".stripMargin
}
