package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TimeExprs, VectorExprs}
import graft.operators.{Dedup, NearDup, Similarity}
import graft.sources.Tables

/** Text analysis and quality: tokenization, language-ID, Gopher rules, PII, entropy, normalization, boilerplate, PMI, TextRank.
  *
  * One domain slice of the query registry (split from the single-file
  * registry in round 15 — same members, same semantics). Members are
  * `private[queries]` so cross-domain references keep working; `val`s
  * became `lazy val`s so initialization is order-independent across the
  * trait mix-in. Mixed into [[TestdataQueries]], which owns the maps.
  */
private[queries] trait TdqText { this: TestdataQueries.type =>

  // ------------------------------------------------------ text analysis §2.10
  private[queries] def q15TextStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextExprs.tokenCount(col("text")).as("n_tokens"),
      size(TextExprs.distinctTokens(col("text"))).as("n_distinct"),
      length(col("text")).as("n_chars_m"),
      TextExprs.meanTokenLenX100(col("text")).as("mean_tok_x100"),
      round(TextExprs.punctRatio(col("text")), 6).as("punct_ratio"),
      round(TextExprs.alphaRatio(col("text")), 6).as("alpha_ratio"))

  private[queries] lazy val q15Sql =
    """SELECT doc_id,
      |  CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
      |  CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) END AS n_distinct,
      |  length(text) AS n_chars_m,
      |  CAST((list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'), t -> CAST(len(t) AS BIGINT))) * 100)
      |    // greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT), 1) AS BIGINT) AS mean_tok_x100,
      |  round(CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
      |        / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
      |  round(CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS DOUBLE)
      |        / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS alpha_ratio
      |FROM documents""".stripMargin

  // Language-ID heuristic vs the labeled lang column.
  private[queries] def q16LangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      TextExprs.langIdGuess(col("text")).as("lang_guess"))

  // Mirrors langIdGuess's greatest(struct(score, lang)): winner = max score,
  // ties broken by max lang string → CASE tested in descending lang order.
  private[queries] lazy val q16Sql = {
    val langs = Seq(
      "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"),
      "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "est"),
      "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "un"),
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
      "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "zu"))
    val scores = langs.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')), $arr)) AS ${l}_s"
    }.mkString(",\n  ")
    val cases = langs.map { case (l, _) =>
      val others = langs.map(_._1).filterNot(_ == l)
      val cond = others.map(o => s"${l}_s >= ${o}_s").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString("\n    ", "\n    ", "")
    s"""SELECT doc_id, lang, CASE$cases
       |  END AS lang_guess
       |FROM (SELECT doc_id, lang, text,
       |  $scores
       |FROM documents)""".stripMargin
  }

  // Deterministic rolling-hash fingerprint (oracle-portable, unlike xxhash).
  private[queries] def q17Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        TextExprs.polyFingerprint(col("text")).as("fingerprint"))

  private[queries] lazy val q17Sql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
      |    (a, c) -> (a * 31 + c) % 1000000007) AS fingerprint
      |FROM documents WHERE length(text) > 0""".stripMargin

  // ------------------------------------------------- tf-idf (§2.10 text)
  private[queries] def q47TfIdf(s: SparkSession, d: String): DataFrame =
    graft.operators.TfIdf.topTerms(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 3)
      .withColumnRenamed("id", "doc_id")

  private[queries] lazy val q47Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents WHERE length(trim(text)) > 0),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |wt AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) AS weight
      |  FROM tf JOIN df USING (term))
      |SELECT doc_id, rank, term, tf, df, round(weight, 6) AS weight
      |FROM (SELECT *, CAST(row_number() OVER (
      |        PARTITION BY doc_id ORDER BY weight DESC, term) AS INTEGER) AS rank
      |      FROM wt) WHERE rank <= 3""".stripMargin

  // ------------------------- repetition quality signals (§2.10 ext)
  // Gopher-style per-document repetition stats: distinct-token ratio
  // ingredients and the top word-2gram count — the "is this document
  // degenerate boilerplate" filter of a training-data pipeline. Bigram
  // mode via explode + two-level agg (per-doc key shuffle, map-combined),
  // not per-row O(m²) array scans. Integer outputs hash exactly;
  // `repetitive` mirrors Gopher's top-2gram fraction > 0.2 as an integer
  // comparison (cnt * 5 > n) — no float division in compared output.
  private[queries] def q59Repetition(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), TextExprs.tokens(col("text")).as("ts"))
    val base = toks.select(col("doc_id"),
      size(col("ts")).cast("long").as("n_tokens"),
      size(array_distinct(col("ts"))).cast("long").as("n_distinct_tok"))
    val bigrams = toks
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        max(col("c")).as("top_bigram_cnt"), sum(col("c")).as("n_bigrams"))
    base.join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tok"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
        (coalesce(col("top_bigram_cnt"), lit(0L)) * 5 >
          coalesce(col("n_bigrams"), lit(0L))).as("repetitive"))
  }

  private[queries] lazy val q59Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
      |  FROM documents),
      |base AS (
      |  SELECT doc_id, len(ts) AS n_tokens,
      |    len(list_distinct(ts)) AS n_distinct_tok FROM t),
      |bg AS (
      |  SELECT doc_id,
      |    unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS bg
      |  FROM t WHERE len(ts) >= 2),
      |bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
      |agg AS (SELECT doc_id, max(c) AS top_bigram_cnt,
      |        CAST(sum(c) AS BIGINT) AS n_bigrams FROM bgc GROUP BY doc_id)
      |SELECT base.doc_id, n_tokens, n_distinct_tok,
      |  coalesce(n_bigrams, 0) AS n_bigrams,
      |  coalesce(top_bigram_cnt, 0) AS top_bigram_cnt,
      |  coalesce(top_bigram_cnt, 0) * 5 > coalesce(n_bigrams, 0) AS repetitive
      |FROM base LEFT JOIN agg ON base.doc_id = agg.doc_id""".stripMargin

  // ----------------------------- PII redaction (§2.10 ext)
  // Ordered-class scrubbing (email → ip → phone → number) with per-class
  // match counts — the privacy pass of a training-data pipeline. Patterns
  // live in TextExprs.piiPatterns (Java∩RE2 subset) and the oracle SQL is
  // GENERATED from the same list, one CTE per class, so Spark and DuckDB
  // replay the identical replace cascade. The events.props JSON exercises
  // the number class on real data; all classes are unit-spec'd.
  private[queries] def q69PiiRedact(s: SparkSession, d: String): DataFrame = {
    val counts = TextExprs.piiCounts(col("props")).as("c")
    Tables.events(s, d)
      .select(col("event_id"), counts,
        TextExprs.piiRedact(col("props")).as("redacted"))
      .select(col("event_id"), col("c.n_email"), col("c.n_ip"),
        col("c.n_phone"), col("c.n_number"), col("redacted"))
  }

  private[queries] lazy val q69Sql = {
    val steps = TextExprs.piiPatterns
    val sb = new StringBuilder(
      "WITH s0 AS (SELECT event_id, props AS t FROM events)")
    var carried = Seq.empty[String]
    steps.zipWithIndex.foreach { case ((name, re, tok), i) =>
      val cols = (carried :+
        s"CAST(len(regexp_extract_all(t, '$re')) AS BIGINT) AS n_$name")
        .mkString(", ")
      sb.append(s",\ns${i + 1} AS (SELECT event_id, $cols, " +
        s"regexp_replace(t, '$re', '$tok', 'g') AS t FROM s$i)")
      carried = carried :+ s"n_$name"
    }
    sb.append(s"\nSELECT event_id, ${carried.mkString(", ")}, t AS redacted " +
      s"FROM s${steps.length}")
    sb.toString
  }

  // ----------------------------- document chunking (§2.10 ext)
  // Fixed-size token windows with overlap — the context-length prep stage
  // before packing, and the RAG index unit. Map-side only; the oracle
  // replays window arithmetic and the space-rejoin exactly.
  private[queries] lazy val q84Size = 64
  private[queries] lazy val q84Overlap = 16

  private[queries] def q84Chunks(s: SparkSession, d: String): DataFrame =
    graft.operators.Chunk.tokenChunks(Tables.documents(s, d),
        col("doc_id"), col("text"), q84Size, q84Overlap)
      .withColumnRenamed("id", "doc_id")

  private[queries] lazy val q84Sql = {
    val sz = q84Size; val st = q84Size - q84Overlap
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
       |  FROM documents WHERE length(trim(text)) > 0),
       |c AS (
       |  SELECT doc_id, ts,
       |    CASE WHEN len(ts) <= $sz THEN 1
       |         ELSE 1 + (len(ts) - $sz + $st - 1) // $st END AS nc
       |  FROM toks)
       |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       |  CAST(least($sz, len(ts) - i * $st) AS INTEGER) AS n_tokens,
       |  array_to_string(ts[i * $st + 1 : i * $st + $sz], ' ') AS chunk_text
       |FROM (SELECT doc_id, ts, unnest(range(0, nc)) AS i FROM c)""".stripMargin
  }

  // ----------------------------- text normalization (§2.10 ext)
  // Canonical form before dedup/fingerprinting: NFC (codegen'd kernel),
  // lowercase, control chars → space, whitespace collapse, trim. The
  // oracle replays the identical chain with DuckDB's nfc_normalize.
  private[queries] def q86Normalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      graft.functions.TextExprs.normalizeText(col("text")).as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))

  private[queries] lazy val q86Sql =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(
      |    lower(nfc_normalize(text)), '[[:cntrl:]]', ' ', 'g'),
      |    '\s+', ' ', 'g')) AS norm_text,
      |  CAST(length(trim(regexp_replace(regexp_replace(
      |    lower(nfc_normalize(text)), '[[:cntrl:]]', ' ', 'g'),
      |    '\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm
      |FROM documents""".stripMargin

  // ----------------------------- Gopher quality rules (§2.10 text)
  // Rae et al. 2021 Appendix A rule filter: per-rule boolean flags plus
  // the keep conjunction, every threshold in integer arithmetic so the
  // oracle replays the decisions bit-exactly. Map-side only.
  private[queries] def q101GopherRules(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextExprs.gopherFlags(col("text")).as("g"))
      .select(col("doc_id"), col("g.n_tok").as("n_tok"),
        col("g.r_len").as("r_len"), col("g.r_wordlen").as("r_wordlen"),
        col("g.r_alpha").as("r_alpha"), col("g.r_stop").as("r_stop"),
        col("g.r_distinct").as("r_distinct"), col("g.keep").as("keep"))

  private[queries] lazy val q101Sql = {
    val stops = TextExprs.defaultStopwords.map(w => s"'$w'")
      .mkString("[", ", ", "]")
    s"""$q71TokensCte,
       |f AS (
       |  SELECT doc_id, len(ts) AS n,
       |    COALESCE(list_sum(list_transform(ts, t -> length(t))), 0) * 100
       |      // greatest(len(ts), 1) AS meanx100,
       |    len(list_filter(ts, t -> regexp_matches(t, '\\p{L}'))) AS alpha_tok,
       |    len(list_intersect(list_distinct(list_transform(ts, t -> lower(t))),
       |        $stops)) AS stop_hits,
       |    len(list_distinct(ts)) AS n_distinct
       |  FROM toks)
       |SELECT doc_id, n AS n_tok,
       |  (n >= 50 AND n <= 100000) AS r_len,
       |  (meanx100 >= 300 AND meanx100 <= 1000) AS r_wordlen,
       |  (alpha_tok * 10 >= n * 8) AS r_alpha,
       |  (stop_hits >= 2) AS r_stop,
       |  (n_distinct * 5 >= n) AS r_distinct,
       |  ((n >= 50 AND n <= 100000) AND (meanx100 >= 300 AND meanx100 <= 1000)
       |   AND (alpha_tok * 10 >= n * 8) AND (stop_hits >= 2)
       |   AND (n_distinct * 5 >= n)) AS keep
       |FROM f""".stripMargin
  }

  // ----------------------------- boilerplate segment drop (§2.10 ext)
  // RefinedWeb's line-dedup rule at q88's token-segment granularity: a
  // segment occurring in ≥ 2 DISTINCT documents is boilerplate and is
  // dropped from EVERY doc (no survivor — the opposite keep rule to
  // q88's first-occurrence). The oracle groups by segment text itself,
  // so a 128-bit hash collision on the Spark side would surface.
  private[queries] def q105BoilerplateSegments(s: SparkSession, d: String): DataFrame =
    Dedup.dropFrequentSegments(Tables.documents(s, d), col("doc_id"),
      col("text"), w = q88W, minDf = 2)

  private[queries] lazy val q105Sql = {
    val w = q88W
    s"""WITH toks AS (
       |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |       ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |segs AS (
       |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
       |    array_to_string(ts[i * $w + 1 : i * $w + $w], ' ') AS seg
       |  FROM (SELECT doc_id, ts,
       |          unnest(range(0, (len(ts) + ${w - 1}) // $w)) AS i FROM toks)),
       |freq AS (
       |  SELECT seg FROM (
       |    SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
       |  WHERE df >= 2),
       |kept AS (SELECT doc_id, pos, seg FROM segs ANTI JOIN freq USING (seg)),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(seg, ' ' ORDER BY pos) AS txt
       |  FROM kept GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST((len(t.ts) + ${w - 1}) // $w AS BIGINT) AS n_segments,
       |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       |  coalesce(a.txt, '') AS text
       |FROM toks t LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  // ----------------------------- n-gram diversity metrics (§2.10 ext)
  // Corpus-datasheet repetitiveness signal: per source and per n ∈
  // {1,2,3}, total n-gram occurrences, distinct n-grams, and their
  // ratio (type-token ratio at n=1). The Spark side shuffles only
  // (group, hash128) — the oracle groups by the gram string itself.
  private[queries] def q109NgramDiversity(s: SparkSession, d: String): DataFrame =
    graft.operators.Diversity.ngramDiversity(Tables.documents(s, d),
      col("text"), col("source"), Seq(1, 2, 3))

  private[queries] lazy val q109Sql = {
    def level(n: Int) =
      s"""SELECT grp, $n AS n, count(*) AS n_grams,
         |  count(DISTINCT g) AS n_distinct,
         |  round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) AS diversity
         |FROM (
         |  SELECT source AS grp,
         |    unnest([array_to_string(ts[i:i+${n - 1}], ' ')
         |            for i in range(1, len(ts) - ${n - 2})]) AS g
         |  FROM toks WHERE len(ts) >= $n)
         |GROUP BY grp""".stripMargin
    s"""WITH toks AS (
       |  SELECT source, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |       ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents)
       |${Seq(1, 2, 3).map(level).mkString("\nUNION ALL\n")}""".stripMargin
  }

  // ----------------------------- character entropy (§2.10 ext)
  // Shannon entropy of the per-doc character distribution — the
  // gibberish/base64/padding gate. Spark computes it map-side (sorted
  // distinct-char fold); the oracle replays it relationally. round(4)
  // absorbs the sum-order float delta; `0 -` keeps +0.0 (not -0.0) on
  // single-distinct-char docs so the normalized hash agrees.
  private[queries] def q113CharEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      graft.functions.TextExprs.charEntropy(col("text")).as("char_entropy"))

  private[queries] lazy val q113Sql =
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS c
      |  FROM documents WHERE length(text) > 0),
      |hist AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
      |tot AS (SELECT doc_id, sum(n) AS t FROM hist GROUP BY 1),
      |ent AS (
      |  SELECT h.doc_id, round(0 - sum(
      |      (CAST(n AS DOUBLE) / t) * ln(CAST(n AS DOUBLE) / t)), 4)
      |    AS char_entropy
      |  FROM hist h JOIN tot USING (doc_id) GROUP BY h.doc_id)
      |SELECT d.doc_id, coalesce(e.char_entropy, 0.0) AS char_entropy
      |FROM documents d LEFT JOIN ent e USING (doc_id)""".stripMargin

  // ----------------------------- phrase blocklist (§2.10 ext)
  // Whole-word-sequence phrase matching (C4 bad-words shape): broadcast
  // phrase table, one tokenize per doc, only matched grams shuffle.
  private[queries] lazy val q119Phrases =
    Seq("slow query", "big table", "merge batch", "vector", "the group line")

  private[queries] def q119Blocklist(s: SparkSession, d: String): DataFrame =
    graft.operators.Blocklist.phraseHits(Tables.documents(s, d),
      col("doc_id"), col("text"), q119Phrases)
      .withColumnRenamed("id", "doc_id")

  private[queries] lazy val q119Sql = {
    val lens = q119Phrases.map(_.split(" ").length).distinct.sorted
    val branches = lens.map { n =>
      s"""SELECT doc_id, unnest(
         |    [array_to_string(ts[i:i+${n - 1}], ' ')
         |     for i in range(1, len(ts) - ${n - 2})]) AS g
         |  FROM toks WHERE len(ts) >= $n""".stripMargin
    }.mkString("\nUNION ALL\n")
    val vals = q119Phrases.map(p => s"('$p')").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ts
       |  FROM documents),
       |g AS (
       |$branches),
       |p(phrase) AS (VALUES $vals),
       |h AS (SELECT doc_id, g FROM g JOIN p ON g.g = p.phrase)
       |SELECT doc_id, count(*) AS n_hits,
       |  count(DISTINCT g) AS n_phrases
       |FROM h GROUP BY doc_id""".stripMargin
  }

  // ----------------------------- per-source quality buckets (§2.10 ext)
  // The q102 (CCNet buckets) composition PER SOURCE: within-source
  // quality terciles from the k-bounded group quantile sketch — no
  // per-source sort of the corpus, boundaries broadcast back. Quality is
  // rounded(6) BEFORE sketching so boundary comparisons are
  // engine-identical.
  private[queries] def q123SourceQualityBuckets(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("source"),
        round(graft.functions.TextExprs.qualityScore(col("text")), 6)
          .as("quality"))
    val qs = graft.operators.Sketch.quantileSketchByGroup(scored,
      col("source"), col("quality"), col("doc_id"), q67K,
      Seq(1.0 / 3, 2.0 / 3))
    val bounds = qs.groupBy(col("grp"))
      .agg(min(col("est_value")).as("t1"), max(col("est_value")).as("t2"))
    scored.join(broadcast(bounds), col("source") === col("grp"))
      .select(col("doc_id"), col("source"), col("quality"),
        when(col("quality") <= col("t1"), "head")
          .when(col("quality") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  private[queries] lazy val q123Sql = {
    val raw = "list_reduce(list_transform(string_split(" +
      "CAST(doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val h = s"((($raw * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    val (p1, p2) = (1.0 / 3, 2.0 / 3)
    s"""WITH sc AS (
       |  SELECT doc_id, source, round(
       |    $qualitySqlBody,
       |    6) AS q
       |  FROM documents WHERE length(trim(text)) > 0),
       |hv AS (SELECT DISTINCT source, $h AS h, CAST(q AS DOUBLE) AS v
       |       FROM sc),
       |sel AS (SELECT source, h, v, row_number() OVER (
       |          PARTITION BY source ORDER BY h, v) AS rn FROM hv
       |        QUALIFY rn <= $q67K),
       |srt AS (SELECT source, v, row_number() OVER (
       |          PARTITION BY source ORDER BY v, h) AS qrn FROM sel),
       |n AS (SELECT source, max(qrn) AS n_sample FROM srt GROUP BY source),
       |b AS (
       |  SELECT srt.source,
       |    max(CASE WHEN qrn = r1 THEN v END) AS t1,
       |    max(CASE WHEN qrn = r2 THEN v END) AS t2
       |  FROM srt JOIN (
       |    SELECT source, CAST(ceil($p1 * n_sample) AS INT) AS r1,
       |           CAST(ceil($p2 * n_sample) AS INT) AS r2 FROM n) rr
       |    USING (source)
       |  GROUP BY srt.source)
       |SELECT sc.doc_id, sc.source, sc.q AS quality,
       |  CASE WHEN sc.q <= t1 THEN 'head'
       |       WHEN sc.q <= t2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM sc JOIN b ON sc.source = b.source""".stripMargin
  }

  // ------------------- boilerplate n-gram mining (§2.10 ext)
  // Per-source top-k 3-grams by count (top-k WITH TIES at the k-th
  // count — the only engine-replayable boundary): the template-phrase
  // miner whose survivors feed the q119 blocklist / q105 span dedup.
  private[queries] lazy val q140N = 3
  private[queries] lazy val q140K = 5

  private[queries] def q140BoilerplateNgrams(s: SparkSession, d: String): DataFrame =
    graft.operators.Frequent.topNgramsPerGroup(Tables.documents(s, d),
      col("text"), col("source"), q140N, q140K)
      .select(col("grp").as("source"), col("gram"), col("cnt"))

  private[queries] lazy val q140Sql =
    s"""WITH tk AS (
       |  SELECT source,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |g AS (
       |  SELECT source, unnest(list_transform(
       |      range(1, len(ts) - ${q140N - 1} + 1),
       |      i -> array_to_string(ts[i:i+${q140N - 1}], ' '))) AS gram
       |  FROM tk WHERE len(ts) >= $q140N),
       |c AS (SELECT source, gram, count(*) AS cnt FROM g
       |      GROUP BY source, gram),
       |t AS (SELECT source, min(cnt) AS min_cnt FROM (
       |        SELECT source, cnt, row_number() OVER (
       |          PARTITION BY source ORDER BY cnt DESC, gram) AS rank
       |        FROM c) WHERE rank <= $q140K GROUP BY source)
       |SELECT c.source, c.gram, c.cnt
       |FROM c JOIN t ON c.source = t.source AND c.cnt >= t.min_cnt""".stripMargin

  // ------------------- PMI collocations (§2.10 ext)
  // Church-&-Hanks collocation mining: top pairs by how far above chance
  // they co-occur. The CANDIDATE ORDER is a pure integer-double ratio
  // (no transcendental in the sort key — a last-ulp ln() disagreement
  // between engines can't reorder ties); ln is applied only to the
  // rounded display column.
  private[queries] lazy val q175K = 30
  private[queries] lazy val q175MinCount = 5

  private[queries] def q175PmiCollocations(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.pmiCollocations(Tables.documents(s, d),
      col("text"), k = q175K, minCount = q175MinCount)

  private[queries] lazy val q175Sql =
    s"""$q71PairsCte,
       |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c_t
       |  FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1),
       |pc AS (SELECT l_tok, r_tok, CAST(count(*) AS BIGINT) AS n_pair
       |  FROM pairs GROUP BY 1, 2 HAVING count(*) >= $q175MinCount),
       |tot AS (SELECT (SELECT CAST(sum(c_t) AS BIGINT) FROM uni) AS n_uni,
       |    (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_pairs),
       |sc AS (SELECT pc.l_tok, pc.r_tok, pc.n_pair,
       |    CAST(pc.n_pair AS DOUBLE) * CAST(tot.n_uni AS DOUBLE) *
       |      CAST(tot.n_uni AS DOUBLE) / CAST(tot.n_pairs AS DOUBLE) /
       |      CAST(ul.c_t AS DOUBLE) / CAST(ur.c_t AS DOUBLE) AS ratio
       |  FROM pc JOIN uni ul ON pc.l_tok = ul.t
       |    JOIN uni ur ON pc.r_tok = ur.t CROSS JOIN tot),
       |r AS (SELECT *, row_number() OVER (
       |    ORDER BY ratio DESC, l_tok, r_tok) AS rank FROM sc)
       |SELECT CAST(rank AS INTEGER) AS rank, l_tok, r_tok, n_pair,
       |  round(ln(ratio), 4) AS pmi
       |FROM r WHERE rank <= $q175K""".stripMargin

  // ------------------- language-ID confusion matrix (§2.10 ext)
  // Declared lang vs the n-gram guess (q16), as the confusion matrix +
  // per-declared-lang share: the data-quality check on the lang column
  // itself. Pure composition: two count aggregates over q16's output.
  private[queries] def q228LangConfusion(s: SparkSession, d: String): DataFrame = {
    val g = q16LangId(s, d)
    val c = g.groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy(col("lang")).agg(sum(col("n")).as("tot"))
    c.join(broadcast(t), Seq("lang"))
      .select(col("lang"), col("lang_guess"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("share"))
  }

  private[queries] lazy val q228Sql =
    s"""WITH g AS ($q16Sql),
       |c AS (SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
       |      FROM g GROUP BY 1, 2),
       |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot
       |      FROM c GROUP BY 1)
       |SELECT c.lang, c.lang_guess, c.n,
       |  round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
       |FROM c JOIN t USING (lang)""".stripMargin

  // ------------------- TextRank keywords (§2.10 ext)
  // PageRank over the token co-occurrence graph: vocabulary-bounded
  // edges, 1e-12 fixed-point ranks, per-edge contributions snapped
  // before the per-node sum so all three iterations replay exactly.
  // Constants (damping, teleport mass) are emitted from the operator's
  // Scala doubles — (1-0.85)*1e12 is NOT the decimal 1.5e11 in IEEE.
  private[queries] lazy val q201MinCount = 5L
  private[queries] lazy val q201Damping = 0.85
  private[queries] lazy val q201Iters = 3
  private[queries] lazy val q201K = 25

  private[queries] def q201TextRank(s: SparkSession, d: String): DataFrame =
    graft.operators.TextRank.textRank(Tables.documents(s, d),
      col("text"), q201MinCount, q201Damping, q201Iters, q201K)

  private[queries] lazy val q201Sql = {
    val d = q201Damping.toString
    val base = ((1.0 - q201Damping) * 1e12).toString
    val iters = (1 to q201Iters).map { i =>
      s"""a$i AS (SELECT dst, CAST(sum(CAST(round(CAST(r AS DOUBLE) * $d *
         |      CAST(w AS DOUBLE) / CAST(wdeg AS DOUBLE)) AS BIGINT))
         |    AS BIGINT) AS s
         |  FROM ed JOIN wd USING (src) JOIN r${i - 1} ON r${i - 1}.tok = ed.src
         |  GROUP BY 1),
         |r$i AS (SELECT dst AS tok,
         |    CAST(round($base / CAST(n AS DOUBLE)) AS BIGINT) + s AS r
         |  FROM a$i CROSS JOIN nn)""".stripMargin
    }.mkString(",\n")
    s"""$q71PairsCte,
       |und AS (SELECT least(l_tok, r_tok) AS a, greatest(l_tok, r_tok) AS b,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM pairs WHERE l_tok <> r_tok GROUP BY 1, 2
       |  HAVING count(*) >= $q201MinCount),
       |ed AS (SELECT a AS src, b AS dst, w FROM und
       |  UNION ALL SELECT b, a, w FROM und),
       |wd AS (SELECT src, CAST(sum(w) AS BIGINT) AS wdeg FROM ed GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM wd),
       |r0 AS (SELECT src AS tok,
       |    CAST(round(1e12 / CAST(n AS DOUBLE)) AS BIGINT) AS r
       |  FROM wd CROSS JOIN nn),
       |$iters
       |SELECT CAST(rank AS INTEGER) AS rank, tok AS token,
       |  round(CAST(r AS DOUBLE) / 1e12, 6) AS score
       |FROM (SELECT *, row_number() OVER (ORDER BY r DESC, tok) AS rank
       |  FROM r$q201Iters)
       |WHERE rank <= $q201K""".stripMargin
  }
}
