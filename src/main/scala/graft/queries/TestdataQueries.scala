package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TimeExprs, VectorExprs}
import graft.operators.{Dedup, NearDup, Similarity}
import graft.sources.Tables

/** The operator inventory (SURVEY.md §2) instantiated as named queries over
  * the driver testdata (TESTDATA.md), each with equivalent DuckDB oracle SQL.
  *
  * Oracle-hash discipline (the driver sorts columns by name and hashes
  * values — SparkEntry contract):
  *  - aggregates of doubles go through exact decimal(18,2) sums, then cast
  *    back to double: both engines produce the identical nearest double of
  *    the same exact decimal;
  *  - ratios/cosines are a single IEEE op sequence mirrored verbatim in the
  *    oracle SQL, then round(…, 4..6);
  *  - timestamps are rendered to strings with explicit formats.
  */
object TestdataQueries {

  /** Exact sum of a double measure: decimal for associativity-proof
    * accumulation, double for a schema both engines agree on. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  // ---------------------------------------------------------------- A3 / P1
  // Grouped aggregation over the fact table (per-poll count metrics analog).
  private def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------- J1–J10 / F1
  // Deep join tree: inner facts + left-joined dims, with a WHERE predicate on
  // a left-joined column (replicates the reference's F1-converts-J2-to-inner
  // interplay, cancellations_current_future.sql:32). Dims are broadcast.
  private def q2JoinTree(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"), "left")
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(col("p_size") > 10 && col("s_acctbal") > 0 &&
        col("r_name").isNotNull)
      .groupBy("r_name", "o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))

  private val q2Sql =
    """SELECT r_name, o_orderpriority, count(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |LEFT JOIN nation ON c_nationkey = n_nationkey
      |LEFT JOIN region ON n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN part     ON l_partkey = p_partkey
      |WHERE p_size > 10 AND s_acctbal > 0 AND r_name IS NOT NULL
      |GROUP BY r_name, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- F2–F6
  // Temporal-validity OR-branch + IN-list + null checks (snapshot predicate
  // analog of cancellations_current_future.sql:33–38).
  private def q3Filters(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(
        (col("o_orderdate") > lit("1996-01-01").cast("timestamp")
          || (col("o_orderstatus") === "F"
            && col("o_orderdate") >= lit("1994-06-01").cast("timestamp")))
          && col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          && col("o_custkey").isNotNull)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))

  private val q3Sql =
    """SELECT o_orderkey, o_orderstatus, o_orderpriority,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM orders
      |WHERE (o_orderdate > TIMESTAMP '1996-01-01'
      |       OR (o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '1994-06-01'))
      |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  AND o_custkey IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------- P2–P8
  // Scalar projection pack: fixed-char cast, substring digit extract,
  // string→int cast, style-112 date, zero-pad, service-day time (>24h safe).
  private def q4Scalars(s: SparkSession, d: String): DataFrame = {
    val ts = col("ts").cast("timestamp")
    // base = midnight of the previous day → hours in 24..47, exercising the
    // no-mod-24 semantics (cancellations_current_future.sql:17–19).
    val base = date_trunc("day", ts) - expr("INTERVAL 1 DAY")
    Tables.events(s, d).select(
      col("event_id"),
      col("event_id").cast("string").as("id_str"),
      substring(col("event_id").cast("string"), 1, 1).cast("int").as("first_digit"),
      TimeExprs.style112(ts).as("day112"),
      TimeExprs.zeroPad2(dayofmonth(ts)).as("dom_padded"),
      TimeExprs.serviceDayTime(base, ts).as("service_time"))
  }

  private val q4Sql =
    """SELECT event_id,
      |  CAST(event_id AS VARCHAR) AS id_str,
      |  CAST(substring(CAST(event_id AS VARCHAR), 1, 1) AS INTEGER) AS first_digit,
      |  strftime(ts, '%Y%m%d') AS day112,
      |  lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS dom_padded,
      |  lpad(CAST(((epoch_ms(ts::TIMESTAMP) - epoch_ms(date_trunc('day', ts::TIMESTAMP) - INTERVAL 1 DAY)) // 60000) // 60 AS VARCHAR), 2, '0')
      |    || ':' || lpad(CAST(((epoch_ms(ts::TIMESTAMP) - epoch_ms(date_trunc('day', ts::TIMESTAMP) - INTERVAL 1 DAY)) // 60000) % 60 AS VARCHAR), 2, '0')
      |    || ':00' AS service_time
      |FROM events""".stripMargin

  // ------------------------------------------------------------------- A1
  // Grouped priority dedup ≙ filterDuplicates (OmmCancellationHandler.java:
  // 168–204): per user, 'error' events (≙ CANCELED) beat others (≙ RUNNING),
  // then latest ts, then smallest event_id (deterministic total order).
  private def q5PriorityDedup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val priority = when(col("event_type") === "error", 0).otherwise(1)
    Dedup.priorityDedup(ev, Seq("user_id"), priority,
        col("ts"), col("event_id"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
  }

  private val q5Sql =
    """SELECT user_id, event_id, event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id
      |    ORDER BY (CASE WHEN event_type = 'error' THEN 0 ELSE 1 END),
      |             ts DESC, event_id) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  // ------------------------------------------------------------------- A2
  // Batch-over-batch diff ≙ logChangesInCancellations: split events at a ts
  // midpoint, count users new-vs-repeated in the second half.
  // events span 2024-01-01 .. 2024-01-30; split after week 1 so the "current
  // batch" genuinely contains both repeated and (at key granularity
  // user×type) new keys.
  private val splitTs = "2024-01-08"

  private def q6BatchDiff(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val prev = ev.filter(col("ts") < lit(splitTs).cast("timestamp"))
    val curr = ev.filter(col("ts") >= lit(splitTs).cast("timestamp"))
    Dedup.batchDiffCounts(curr, prev, "user_id")
  }

  private val q6Sql =
    s"""SELECT
       |  count(CASE WHEN p.user_id IS NULL THEN 1 END) AS new_keys,
       |  count(CASE WHEN p.user_id IS NOT NULL THEN 1 END) AS repeated_keys
       |FROM (SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '$splitTs') c
       |LEFT JOIN (SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '$splitTs') p
       |  USING (user_id)""".stripMargin

  // Change capture rows: current-batch rows whose key is absent from prev.
  private def q7NewRows(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val prev = ev.filter(col("ts") < lit(splitTs).cast("timestamp"))
    val curr = ev.filter(col("ts") >= lit(splitTs).cast("timestamp"))
    Dedup.newRows(curr, prev, Seq("user_id", "event_type"))
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n_events"))
  }

  private val q7Sql =
    s"""SELECT user_id, event_type, count(*) AS n_events
       |FROM events c WHERE ts >= TIMESTAMP '$splitTs'
       |  AND NOT EXISTS (SELECT 1 FROM events p
       |                  WHERE p.ts < TIMESTAMP '$splitTs'
       |                    AND p.user_id = c.user_id
       |                    AND p.event_type = c.event_type)
       |GROUP BY user_id, event_type""".stripMargin

  // ------------------------------------------------------- exact dedup §2.10
  private def q8DupGroups(s: SparkSession, d: String): DataFrame =
    Dedup.exactDupGroups(Tables.documents(s, d), col("text"), col("doc_id"))
      .select(col("representative_id"), col("n_copies"))

  private val q8Sql =
    """SELECT min(doc_id) AS representative_id, count(*) AS n_copies
      |FROM documents GROUP BY text""".stripMargin

  private def q9ExactDedup(s: SparkSession, d: String): DataFrame =
    Dedup.exactDedup(Tables.documents(s, d), col("text"), col("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_chars"))

  private val q9Sql =
    """SELECT doc_id, lang, n_chars FROM (
      |  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      |  FROM documents) WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- U1–U3
  // Timezone conversions. q10 treats events.ts as Helsinki wall-clock → UTC
  // epoch-ms (≙ toUtcEpochMs); hours 2–4 filtered out on both sides to dodge
  // engine-specific DST-ambiguity resolution (the unit tests cover DST).
  private def q10TzEpoch(s: SparkSession, d: String): DataFrame = {
    val ts = col("ts").cast("timestamp")
    Tables.events(s, d)
      .filter(!hour(ts).isin(2, 3, 4))
      .select(col("event_id"),
        TimeExprs.toUtcEpochMs(ts, "Europe/Helsinki").as("epoch_ms"),
        TimeExprs.localDatetimeAsString(ts, "Europe/Helsinki").as("local_dt"),
        TimeExprs.localDateAsString(ts, "Europe/Helsinki").as("local_d"))
  }

  private val q10Sql =
    """SELECT event_id,
      |  epoch_ms(timezone('Europe/Helsinki', ts::TIMESTAMP)) AS epoch_ms,
      |  strftime(timezone('Europe/Helsinki', timezone('UTC', ts::TIMESTAMP)),
      |           '%Y-%m-%d %H:%M:%S') AS local_dt,
      |  strftime(timezone('Europe/Helsinki', timezone('UTC', ts::TIMESTAMP)),
      |           '%Y-%m-%d') AS local_d
      |FROM events WHERE hour(ts) NOT IN (2, 3, 4)""".stripMargin

  // ------------------------------------------------------------------- U5
  // Status derivation (deleted→RUNNING else CANCELED analog), aggregated.
  private def q11Status(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        when(lower(col("event_type")) === "error", "RUNNING")
          .otherwise("CANCELED").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))

  private val q11Sql =
    """SELECT CASE WHEN lower(event_type) = 'error' THEN 'RUNNING'
      |            ELSE 'CANCELED' END AS status, count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- U4/F8
  // Enum allow-list row-drop with side-output counts (≙ Hand:161–163).
  private val eventAllowList = Seq("click", "view", "purchase", "signup")

  private def q12EnumReject(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(when(col("event_type").isin(eventAllowList.map(lit): _*),
        "kept").otherwise("rejected").as("disposition"))
      .groupBy("disposition").agg(count(lit(1)).as("n"))

  private val q12Sql =
    """SELECT CASE WHEN event_type IN ('click','view','purchase','signup')
      |            THEN 'kept' ELSE 'rejected' END AS disposition, count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  // -------------------------------------------------------------------- O1
  // Sink-boundary sort (ORDER BY last_modified analog). The driver hashes
  // sorted rows, so the *global sort* is exercised in bench; correctness
  // checks content equality.
  private def q13Sort(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("od"))

  private val q13Sql =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od
      |FROM orders ORDER BY o_orderdate, o_orderkey""".stripMargin

  // ------------------------------------------------------- window extension
  // Top-3 orders per customer (window top-k, §2.7 extension surface).
  private def q14TopN(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("price"))
  }

  private val q14Sql =
    """SELECT o_custkey, rank, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY o_custkey
      |        ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |      FROM orders) WHERE rank <= 3""".stripMargin

  // ------------------------------------------------------ text analysis §2.10
  private def q15TextStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextExprs.tokenCount(col("text")).as("n_tokens"),
      size(TextExprs.distinctTokens(col("text"))).as("n_distinct"),
      length(col("text")).as("n_chars_m"),
      TextExprs.meanTokenLenX100(col("text")).as("mean_tok_x100"),
      round(TextExprs.punctRatio(col("text")), 6).as("punct_ratio"),
      round(TextExprs.alphaRatio(col("text")), 6).as("alpha_ratio"))

  private val q15Sql =
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
  private def q16LangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      TextExprs.langIdGuess(col("text")).as("lang_guess"))

  // Mirrors langIdGuess's greatest(struct(score, lang)): winner = max score,
  // ties broken by max lang string → CASE tested in descending lang order.
  private val q16Sql = {
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
  private def q17Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        TextExprs.polyFingerprint(col("text")).as("fingerprint"))

  private val q17Sql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
      |    (a, c) -> (a * 31 + c) % 1000000007) AS fingerprint
      |FROM documents WHERE length(text) > 0""".stripMargin

  // ------------------------------------------------------------ near-dup §2.10
  private def q18ShingleJaccard(s: SparkSession, d: String): DataFrame =
    NearDup.shingleJaccardPairs(Tables.documents(s, d),
      col("doc_id"), col("text"), n = 3, threshold = 0.8, maxPostings = 1000)

  private val q18Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
      |  )) AS shingle FROM toks WHERE len(ts) > 0),
      |sh AS (
      |  SELECT doc_id, shingle FROM (
      |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
      |    FROM sh0) WHERE df <= 1000),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT id_a, id_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
      |  round(CAST(n_inter AS DOUBLE) /
      |        CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.8""".stripMargin

  // MinHash+LSH with enough bands that recall on ≥0.8-Jaccard pairs is
  // effectively certain (16 bands × 2 rows: P(miss | j=0.8) = 0.36^16 ≈
  // 7e-8), and every candidate is verified by exact Jaccard — so the
  // output EQUALS the exact shingle-Jaccard pair set and the oracle is the
  // exact computation itself. A red row here means the LSH lost a pair.
  private def q19MinhashLsh(s: SparkSession, d: String): DataFrame =
    NearDup.minhashLshPairs(Tables.documents(s, d), col("doc_id"), col("text"),
      n = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)

  /** CTE chain computing exact word-3-shingle Jaccard for every
    * intersecting doc pair (`jpairs`) of `src`: the oracle for q19, the
    * edge set for q44's connected components, and (over the curated
    * survivor set) q55's near-dup stage. */
  private def jaccardPairsCteOver(src: String): String =
    s"""toks AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
      |  FROM $src),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
      |  )) AS shingle FROM toks WHERE len(ts) > 0),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |jpairs AS (
      |  SELECT id_a, id_b,
      |    CAST(n_inter AS DOUBLE) /
      |      CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
      |  FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b)""".stripMargin

  private val jaccardPairsCte = jaccardPairsCteOver("documents")

  private val q19Sql =
    s"""WITH $jaccardPairsCte
       |SELECT id_a, id_b, round(jaccard, 6) AS jaccard
       |FROM jpairs WHERE jaccard >= 0.8""".stripMargin

  // Streaming near-dup (§2.10 + reference micro-batch model): the SAME
  // corpus fed as three arrival batches through the incremental band-index
  // stream (NearDupStream.ingestBatch). Batch equivalence — every pair is
  // found exactly once, when its later endpoint arrives — makes the
  // accumulated sink EQUAL the one-shot batch operator, so q19's exact-
  // Jaccard oracle is this query's oracle too. The split key (id % 3)
  // deliberately separates most near-dup pairs into different arrival
  // batches, exercising the cross-generation index-probe path, not just
  // the within-batch self-join.
  private def q57StreamingNeardup(s: SparkSession, d: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("neardup_stream")
      .toString
    val docs = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text"))
    (0 until 3).foreach { b =>
      graft.streaming.NearDupStream.ingestBatch(s,
        docs.filter(col("id") % 3 === b),
        s"$base/state", s"$base/sink",
        n = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)
    }
    s.read.parquet(s"$base/sink")
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // SimHash registered over the ORACLE-PORTABLE polynomial token hash
  // (NearDup.portableTokenHash) so another engine can rebuild the 62-bit
  // signatures bit-for-bit; the xxhash64 variant stays as the faster
  // library path (values unit-tested equivalent in shape, not registered).
  private def q20Simhash(s: SparkSession, d: String): DataFrame =
    NearDup.simhashPolySignatures(Tables.documents(s, d),
      col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("sig").as("simhash"))

  /** Shared CTE body rebuilding the portable simhash signatures in DuckDB:
    * per-token 62-bit poly hash (two list_reduce folds — fold-from-first-
    * element equals fold-from-0 for this recurrence), then the 62 per-bit
    * majority sums. */
  private def simhashSigSql(sigAlias: String): String = {
    val sums = (0 until 62).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n    ")
    val sig = (0 until 62).map(b =>
      s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents WHERE length(trim(text)) > 0),
       |h AS (
       |  SELECT doc_id,
       |    list_reduce(list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT)),
       |                (a, c) -> (a * 31 + c) % 2147483647) * 2147483648
       |    + list_reduce(list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT)),
       |                  (a, c) -> (a * 131 + c) % 2147483629) AS h
       |  FROM toks),
       |bits AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM h GROUP BY doc_id),
       |$sigAlias AS (SELECT doc_id, $sig AS sig FROM bits)""".stripMargin
  }

  private val q20Sql =
    s"""WITH ${simhashSigSql("sig")}
       |SELECT doc_id, sig AS simhash FROM sig""".stripMargin

  // --------------------------------------------------------- similarity §2.10
  // Brute-force exact cosine top-k: queries = vec_id < 10, broadcast side.
  private def q21CosineTopK(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
  }

  // The oracle mirrors the exact IEEE op sequence: sequential double dot
  // products, sqrt norms, one division — then round(4).
  private val q21Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |s AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_inner_product(q.qv, e.v) /
      |      (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(e.v, e.v))) AS c
      |  FROM e CROSS JOIN q WHERE q.query_id <> e.vec_id)
      |SELECT query_id, rank, neighbor_id, round(c, 4) AS cos
      |FROM (SELECT *, CAST(row_number() OVER (
      |        PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank
      |      FROM s) WHERE rank <= 5""".stripMargin

  /** The LSH planes are driver-side constants, so the exact bucketing is
    * reproducible by the oracle: render each plane as a literal DOUBLE[]
    * (Double.toString round-trips) and rebuild the bucket id with the same
    * sign tests. The approximate operator is thereby *fully* specified —
    * the oracle checks the real semantics, not a recall proxy. */
  private def sqlBucket(v: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      val lst = p.map(_.toString).mkString("[", ", ", "]")
      s"(CASE WHEN list_inner_product($v, $lst) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // Multi-probe LSH ANN: 6-bit buckets, probe ring = Hamming ≤ 2 (22 of 64
  // buckets ≈ 1/3 of the corpus per query; measured recall@5 in
  // SimilarityRecallSpec — single-probe was a near-useless 0.10).
  private val q22Bits = 6
  private val q22Probe = 2

  private def q22CosineIvf(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    Similarity.ivfTopK(embs, embs.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, dim = 64, bits = q22Bits, seed = 42L,
      probeHamming = q22Probe)
  }

  private val q22Sql = {
    val bucket = sqlBucket("v", VectorExprs.lshPlanes(64, q22Bits, 42L))
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucket AS bucket,
       |             list_inner_product(v, v) AS n2 FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb, n2 AS qn2
       |      FROM b WHERE vec_id < 10),
       |s AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    list_inner_product(q.qv, c.v) / (sqrt(q.qn2) * sqrt(c.n2)) AS c2
       |  FROM b c JOIN q
       |    ON bit_count(xor(CAST(c.bucket AS BIGINT), CAST(q.qb AS BIGINT))) <= $q22Probe
       |  WHERE q.query_id <> c.vec_id)
       |SELECT query_id, rank, neighbor_id, round(c2, 4) AS cos
       |FROM (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY c2 DESC, neighbor_id) AS INTEGER) AS rank
       |      FROM s) WHERE rank <= 5""".stripMargin
  }

  // The synthetic embeddings top out at pairwise cosine ≈0.51, so 0.4 is the
  // "near-dup" bar that actually yields pairs; 4 bits keeps bucket recall
  // meaningful at that low a similarity.
  private def q23EmbNearDup(s: SparkSession, d: String): DataFrame =
    NearDup.embeddingNearDupPairs(Tables.embeddings(s, d),
      col("vec_id"), col("embedding"), dim = 64, bits = 4, seed = 7L,
      threshold = 0.4)

  private val q23Sql = {
    val bucket = sqlBucket("v", VectorExprs.lshPlanes(64, 4, 7L))
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucket AS bucket,
       |             list_inner_product(v, v) AS n2 FROM e)
       |SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       |  round(list_inner_product(a.v, c.v) / (sqrt(a.n2) * sqrt(c.n2)), 6) AS cos
       |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
       |WHERE list_inner_product(a.v, c.v) / (sqrt(a.n2) * sqrt(c.n2)) >= 0.4""".stripMargin
  }

  // Learned-quantizer IVF (k-means + multi-probe). The trained centroids
  // are not SQL-expressible, so the registered output is the per-query
  // overlap between the IVF top-k and the exact brute-force top-k,
  // asserted as a RECALL FLOOR rather than exact pinned hit counts: each
  // query must find at least one true neighbor AND the 10 queries together
  // must land >= 15 of 50 (recall >= 0.3 with generous margin — measured
  // recall is 0.52–0.62 at every SF, table below). Floors survive an
  // MLlib/Spark upgrade that perturbs KMeans internals; exact pins did
  // not (they silently re-measured, losing their regression value —
  // round-5 ADVICE). The floor is scale-independent, so every SF runs the
  // same oracle with no scale-key plumbing.
  //
  // Measured hits@5 per query for drift diagnosis (seed 42, local[32]):
  //   sf0.001: 0→3 1→3 2→5 3→2 4→4 5→3 6→4 7→2 8→1 9→4  (Σ31, recall .62)
  //   sf0.01:  0→2 1→2 2→2 3→1 4→3 5→3 6→2 7→4 8→3 9→4  (Σ26, recall .52)
  //   sf0.1:   0→2 1→3 2→1 3→2 4→4 5→2 6→4 7→4 8→3 9→5  (Σ30, recall .60)
  private val q31PerQueryFloor = 1L
  private val q31TotalFloor = 15L

  private def q31IvfKmeans(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val qset = embs.filter(col("vec_id") < 10)
    val ann = Similarity.ivfKmeansTopK(embs, qset, "vec_id", "embedding",
      k = 5, nCentroids = 8, nProbe = 2, seed = 42L)
    val exact = Similarity.bruteForceTopK(embs, qset, "vec_id", "embedding",
      k = 5)
    val hitCounts = ann.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    qset.select(col("vec_id").as("query_id"))
      .join(hitCounts, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("hits"))
      .select(col("query_id"),
        // always-zero non-foldable key over the ≤|Q|-row recall table:
        // explicit partition spec, no empty-spec global window (see
        // Sketch.quantilesFromSample's scaladoc for the repo-wide rule)
        (col("hits") >= q31PerQueryFloor &&
          sum(col("hits")).over(Window.partitionBy(pmod(col("hits"), lit(1L))))
            >= q31TotalFloor).as("recall_ok"))
  }

  private val q31Sql =
    s"""SELECT CAST(range AS BIGINT) AS query_id, true AS recall_ok
       |FROM range(10)""".stripMargin

  // SimHash banded near-dup pairs (hamming ≤ 3): the 4×16-bit pigeonhole
  // bands guarantee recall EXACTLY 1.0, so the banded result equals the
  // all-pairs computation — which is what the oracle runs (fine at oracle
  // scale; the banded O(n·4) shuffle is the engine's scale path).
  private def q32SimhashPairs(s: SparkSession, d: String): DataFrame =
    NearDup.simhashPolyNearDupPairs(Tables.documents(s, d),
      col("doc_id"), col("text"), maxHamming = 3)

  private val q32Sql =
    s"""WITH ${simhashSigSql("sig")}
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin

  // ------------------------------------------------------------- JSON props
  // Regex field extraction from the events.props JSON blob (kept regex-based
  // so the oracle needs no DuckDB JSON extension).
  private def q24PropsExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))

  private val q24Sql =
    """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
      |  count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  // ------------------------------------------------------- running window
  private def q25RunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("running_n", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("running_n"))
  }

  private val q25Sql =
    """SELECT event_id, user_id,
      |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS running_n
      |FROM events""".stripMargin

  // ------------------------------------------- BPE-ish tokens + quality
  private def q29Bpeish(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextExprs.bpeishTokenCount(col("text")).as("n_bpe"),
      TextExprs.tokenCount(col("text")).as("n_ws"))

  private val q29Sql = {
    val pat = TextExprs.bpePattern.replace("\\", "\\").replace("'", "''")
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$pat')) AS n_bpe,
       |  CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_ws
       |FROM documents""".stripMargin
  }

  private def q30Quality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0) // parity with the oracle WHERE
      .select(
        col("doc_id"),
        round(TextExprs.qualityScore(col("text")), 6).as("quality"))

  /** TextExprs.qualityScore mirrored in DuckDB, over a column `text`
    * (shared by q30 and q55's quality-floor stage). */
  private val qualitySqlBody = {
    val stops = TextExprs.defaultStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""(CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g')) AS DOUBLE)
       |     / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.4
       |  + least((CAST(len(list_intersect(regexp_split_to_array(trim(lower(text)), '\\s+'), $stops)) AS DOUBLE)
       |           / CAST(greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) AS DOUBLE)) * 5.0, 1.0) * 0.3
       |  + least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.3""".stripMargin
  }

  private val q30Sql =
    s"""SELECT doc_id, round(
       |  $qualitySqlBody,
       |  6) AS quality
       |FROM documents WHERE length(trim(text)) > 0""".stripMargin

  // ---------------------------------------------- skew salting + windows
  // Salted two-phase count: identical result to a plain GROUP BY — the
  // oracle IS the plain GROUP BY.
  private def q33SaltedCount(s: SparkSession, d: String): DataFrame =
    graft.operators.Skew.saltedCount(
      Tables.events(s, d).select("user_id", "event_type"),
      Seq("user_id", "event_type"), saltFactor = 8)

  private val q33Sql =
    """SELECT user_id, event_type, count(*) AS n
      |FROM events GROUP BY user_id, event_type""".stripMargin

  private def q34SaltedJoin(s: SparkSession, d: String): DataFrame =
    graft.operators.Skew.saltedJoin(
      Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_quantity"),
      Tables.supplier(s, d).select("s_suppkey", "s_name"),
      "l_suppkey", "s_suppkey", saltFactor = 8)
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))

  private val q34Sql =
    """SELECT s_name, count(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name""".stripMargin

  // Event-time tumbling window aggregation (batch mode of the streaming
  // operator; Spark windows and DuckDB time_bucket are both epoch-aligned).
  private def q35WindowedCounts(s: SparkSession, d: String): DataFrame =
    graft.streaming.WindowedStats.tumblingCounts(
      Tables.events(s, d), "ts", "event_type", "6 hours", "1 hour")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"))

  private val q35Sql =
    """SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S') AS ws,
      |  event_type, count(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  // ----------------------------------------- §2.7 surface (free from Spark)
  // Rollup (grouping-set aggregation): subtotals + grand total.
  private def q37Rollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  private val q37Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  // Set operators: EXCEPT / INTERSECT / UNION over customer key sets.
  private def q38SetOps(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val open = o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
    val failed = o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
    open.except(failed).withColumn("tag", lit("open_only"))
      .union(open.intersect(failed).withColumn("tag", lit("both")))
  }

  private val q38Sql =
    """SELECT o_custkey, 'open_only' AS tag FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |UNION ALL
      |SELECT o_custkey, 'both' AS tag FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin

  // Structured JSON parsing (from_json → typed struct, vs q24's regex path).
  private def q39FromJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k").cast("long")).as("sum_k"), count(lit(1)).as("n"))

  private val q39Sql =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  // Exact percentiles (deterministic, unlike approx sketches — oracle-able).
  private def q40Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_extendedprice, array(0.25, 0.75))").as("p_price"))
      .select(col("l_returnflag"), round(col("p50_qty"), 4).as("p50_qty"),
        round(col("p_price")(0), 4).as("p25_price"),
        round(col("p_price")(1), 4).as("p75_price"))

  private val q40Sql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // Edit-distance near-dup pairs (the 5th dedup family) at FULL documents
  // cardinality: char-8-gram blocker → exact levenshtein verify over
  // 40-char prefixes (NearDup.editDistancePairs — no cross join, no row
  // cap; the old registration silently capped at doc_id < 500 with an
  // all-pairs join). The oracle encodes the identical blocker semantics.
  private def q41EditDistance(s: SparkSession, d: String): DataFrame =
    NearDup.editDistancePairs(Tables.documents(s, d), col("doc_id"),
      col("text"), prefixLen = 40, q = 8, maxDist = 12, maxPostings = 200)

  private val q41Sql =
    """WITH p AS (
      |  SELECT doc_id, substring(text, 1, 40) AS prefix FROM documents
      |  WHERE length(trim(substring(text, 1, 40))) > 0),
      |g0 AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [substring(np, i, 8) for i in range(1, greatest(len(np) - 7, 1) + 1)]
      |  )) AS gram
      |  FROM (SELECT doc_id,
      |          regexp_replace(trim(prefix), '\s+', ' ', 'g') AS np FROM p)),
      |g AS (
      |  SELECT doc_id, gram FROM (
      |    SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS df
      |    FROM g0) WHERE df <= 200),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b,
      |  CAST(levenshtein(pa.prefix, pb.prefix) AS INTEGER) AS dist
      |FROM cand
      |JOIN p pa ON pa.doc_id = id_a
      |JOIN p pb ON pb.doc_id = id_b
      |WHERE levenshtein(pa.prefix, pb.prefix) <= 12""".stripMargin

  // ------------------------------------------------- as-of join (§2.10 ext)
  // For each click, the user's most recent purchase at-or-before the click.
  // The right side is deduped to one row per (user, ts) so the match is a
  // total function (both engines agree on ties). Oracle: DuckDB's native
  // ASOF LEFT JOIN.
  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def q42AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pts"))
      .agg(min(col("event_id")).as("purchase_id"))
    graft.operators.AsOfJoin.asofJoin(clicks, purchases,
        Seq("user_id"), "ts", "pts")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("ts_str"),
        col("asof_purchase_id"),
        date_format(col("asof_pts"), tsFmt).as("pts_str"))
  }

  private val q42Sql =
    """WITH c AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, ts AS pts, min(event_id) AS purchase_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT c.event_id, c.user_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
      |  p.purchase_id AS asof_purchase_id,
      |  strftime(p.pts, '%Y-%m-%d %H:%M:%S.%f') AS pts_str
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.pts""".stripMargin

  // ---------------------------------------------- sessionization (§2.10 ext)
  private def q43Sessionize(s: SparkSession, d: String): DataFrame =
    graft.operators.Sessionize.sessionStats(Tables.events(s, d),
        Seq("user_id"), col("ts").cast("timestamp"), col("event_id"),
        gapSeconds = 3600L)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        date_format(col("session_start"), tsFmt).as("start_str"),
        date_format(col("session_end"), tsFmt).as("end_str"),
        col("duration_s"))

  private val q43Sql =
    """WITH b AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_ms(ts) // 1000 - epoch_ms(lag(ts) OVER w) // 1000 > 3600
      |         THEN 1 ELSE 0 END AS nb
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      |  FROM b)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_str,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_str,
      |  max(epoch_ms(ts) // 1000) - min(epoch_ms(ts) // 1000) AS duration_s
      |FROM s GROUP BY user_id, session_idx""".stripMargin

  // -------------------------------------- duplicate clusters (§2.10 dedup)
  // Near-dup pairs → connected components → min-id representative: the
  // "keep one per cluster" step of corpus dedup. Edges are the (recall-1.0)
  // minhash-LSH pairs, so the oracle can rebuild the identical edge set
  // exactly (jaccardPairsCte) and resolve components with a recursive CTE.
  private def q44DupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = NearDup.minhashLshPairs(docs, col("doc_id"), col("text"),
        n = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    graft.operators.DupClusters.connectedComponents(
        docs.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("cluster_rep"))
  }

  private val q44Sql =
    s"""WITH RECURSIVE $jaccardPairsCte,
       |und AS (
       |  SELECT id_a AS src, id_b AS dst FROM jpairs WHERE jaccard >= 0.8
       |  UNION ALL
       |  SELECT id_b, id_a FROM jpairs WHERE jaccard >= 0.8),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN und e ON e.src = reach.id)
       |SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id""".stripMargin

  // ------------------------------------------- range join (§2.10 ext)
  // Clicks matched to every same-user purchase window [pts, pts+1h] that
  // contains them — bucketed interval join (one bucket per point, interval
  // replicated per covered bucket, equi-join + exact containment filter).
  private def q45RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val windows = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pstart"))
      .agg(min(col("event_id")).as("purchase_id"))
      .withColumn("pend", col("pstart") + expr("INTERVAL 3600 SECONDS"))
    graft.operators.RangeJoin.pointInIntervalJoin(clicks, windows,
        Seq("user_id"), "ts", "pstart", "pend", bucketSeconds = 3600L)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("ts_str"),
        col("iv_purchase_id"),
        date_format(col("iv_pstart"), tsFmt).as("pstart_str"))
  }

  private val q45Sql =
    """WITH c AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, ts AS pstart, min(event_id) AS purchase_id,
      |    ts + INTERVAL 3600 SECONDS AS pend
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT c.event_id, c.user_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
      |  p.purchase_id AS iv_purchase_id,
      |  strftime(p.pstart, '%Y-%m-%d %H:%M:%S.%f') AS pstart_str
      |FROM c JOIN p ON c.user_id = p.user_id
      |  AND p.pstart <= c.ts AND c.ts <= p.pend""".stripMargin

  // ----------------------------------------------------- pivot (§2.7 ext)
  // Wide per-user event-type counts: Spark relational pivot with an
  // explicit value list (deterministic schema); absent combinations are
  // NULL, mirrored with sum-CASE in the oracle.
  private val pivotTypes = Seq("click", "view", "purchase", "signup", "error")

  private def q46Pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", pivotTypes)
      .agg(count(lit(1)))

  private val q46Sql = {
    val cols = pivotTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 END) AS BIGINT) AS \"$t\"")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id""".stripMargin
  }

  // ------------------------------------------------- tf-idf (§2.10 text)
  private def q47TfIdf(s: SparkSession, d: String): DataFrame =
    graft.operators.TfIdf.topTerms(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 3)
      .withColumnRenamed("id", "doc_id")

  private val q47Sql =
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

  // ------------------------- session_window aggregation (§2.9 streaming)
  // The built-in merging session window, run in batch mode (same plan
  // serves streaming); oracle rebuilds the merge with lag/cumsum at full
  // microsecond precision (session_window merges gaps STRICTLY < gap).
  private def q49SessionWindow(s: SparkSession, d: String): DataFrame =
    graft.streaming.WindowedStats.sessionCounts(Tables.events(s, d),
        "ts", "user_id", "3600 seconds", "0 seconds")
      .select(col("user_id"),
        date_format(col("window_start"), tsFmt).as("ws"),
        date_format(col("window_end"), tsFmt).as("we"),
        col("n"))

  private val q49Sql =
    """WITH b AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 3600000000
      |         THEN 1 ELSE 0 END AS nb
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts
      |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM b)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS ws,
      |  strftime(max(ts) + INTERVAL 3600 SECONDS, '%Y-%m-%d %H:%M:%S.%f') AS we,
      |  count(*) AS n
      |FROM s GROUP BY user_id, sid""".stripMargin

  // --------------------------------- deterministic hash sampling (§2.10)
  // Content-hash sampling: keep ~5% of docs by polynomial fingerprint —
  // reproducible across engines and runs (unlike rand()/TABLESAMPLE),
  // the standard way to cut a stable eval slice from a training corpus.
  private def q48HashSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .filter(pmod(TextExprs.polyFingerprint(col("text")), lit(100L)) < 5)
      .select(col("doc_id"), col("lang"), col("n_chars"))

  private val q48Sql =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE length(text) > 0
      |  AND list_reduce(
      |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
      |        (a, c) -> (a * 31 + c) % 1000000007) % 100 < 5""".stripMargin

  // ------------------------- product quantization (§2.10 embeddings)
  // 64-dim floats → 8 one-byte codes (32× storage compression) via
  // seed-row codebooks (subvectors of designated corpus rows — reachable
  // by the oracle through plain joins), plus ADC top-k that reads only
  // the codes at query time. Exact same slice/fold arithmetic mirrored
  // in SQL; argmin tiebreak = lexicographic (dist, code) on both sides.
  private val pqSeedIds: Seq[Long] = (10L to 25L)
  private val pqM = 8
  private val pqDim = 64
  private val pqSub = pqDim / pqM

  private def q50PqEncode(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val cb = graft.operators.Quantize.seedCodebook(embs, col("vec_id"),
      col("embedding"), pqSeedIds)
    graft.operators.Quantize.pqEncode(embs, col("vec_id"), col("embedding"),
        cb, pqM, pqDim)
      .withColumnRenamed("id", "vec_id")
  }

  private def pqDistSql(j: Int, cbAlias: String): String = {
    val lo = j * pqSub + 1
    val hi = lo + pqSub
    val diff = s"[e.v[i] - $cbAlias.cv[i] for i in range($lo, $hi)]"
    s"list_inner_product($diff, $diff)"
  }

  private def pqCbCtes: String =
    pqSeedIds.zipWithIndex.map { case (cid, c) =>
      s"cb$c AS (SELECT v AS cv FROM e WHERE vec_id = $cid)"
    }.mkString(",\n")

  private val q50Sql = {
    val mins = (0 until pqM).map { j =>
      "list_min([" + pqSeedIds.indices.map(c =>
        s"[${pqDistSql(j, s"cb$c")}, $c.0]").mkString(", ") + s"]) AS m$j"
    }.mkString(",\n    ")
    val codes = (0 until pqM).map(j => s"CAST(m$j[2] AS INTEGER) AS c$j")
      .mkString(", ")
    val mse = (0 until pqM).map(j => s"m$j[1]").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$pqCbCtes,
       |p AS (
       |  SELECT e.vec_id,
       |    $mins
       |  FROM e${pqSeedIds.indices.map(c => s" CROSS JOIN cb$c").mkString})
       |SELECT vec_id, $codes, round($mse, 6) AS distortion FROM p""".stripMargin
  }

  private def q51PqAdc(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val cb = graft.operators.Quantize.seedCodebook(embs, col("vec_id"),
      col("embedding"), pqSeedIds)
    val codes = graft.operators.Quantize.pqEncode(embs, col("vec_id"),
      col("embedding"), cb, pqM, pqDim).drop("distortion")
    graft.operators.Quantize.pqAdcTopK(codes,
      embs.filter(col("vec_id") < 5), "vec_id", "embedding", cb,
      pqM, pqDim, k = 3)
  }

  private val q51Sql = {
    // rebuild the codes (q50 logic), then ADC = Σ_j dist(query_sub_j,
    // centroid[c_j]) via one cb join per subspace
    val mins = (0 until pqM).map { j =>
      "list_min([" + pqSeedIds.indices.map(c =>
        s"[${pqDistSql(j, s"cb$c")}, $c.0]").mkString(", ") + s"]) AS m$j"
    }.mkString(",\n    ")
    val codeSel = (0 until pqM).map(j => s"CAST(m$j[2] AS INTEGER) AS c$j")
      .mkString(", ")
    def qDist(j: Int, alias: String): String = {
      val lo = j * pqSub + 1
      val hi = lo + pqSub
      val diff = s"[q.qv[i] - $alias.cv[i] for i in range($lo, $hi)]"
      s"list_inner_product($diff, $diff)"
    }
    val adc = (0 until pqM).map(j => qDist(j, s"b$j")).mkString(" + ")
    val cbJoins = (0 until pqM).map(j => s"JOIN cb b$j ON b$j.code = k.c$j")
      .mkString("\n  ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$pqCbCtes,
       |cb AS (${pqSeedIds.indices.map(c => s"SELECT $c AS code, cv FROM cb$c").mkString(" UNION ALL ")}),
       |p AS (
       |  SELECT e.vec_id,
       |    $mins
       |  FROM e${pqSeedIds.indices.map(c => s" CROSS JOIN cb$c").mkString}),
       |codes AS (SELECT vec_id AS id, $codeSel FROM p),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |s AS (
       |  SELECT q.query_id, k.id AS neighbor_id, $adc AS adc
       |  FROM codes k
       |  CROSS JOIN qs q
       |  $cbJoins
       |  WHERE q.query_id <> k.id)
       |SELECT query_id, rank, neighbor_id, round(adc, 6) AS adc_dist
       |FROM (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY adc, neighbor_id) AS INTEGER) AS rank
       |      FROM s) WHERE rank <= 3""".stripMargin
  }

  // ----------------------- IVF-PQ / IVFADC top-k (§2.10 embeddings)
  // The billion-vector serving layout (Jégou et al. 2011): a coarse
  // quantizer (8 seed-row lists, ids 30..37) routes each corpus row to one
  // inverted list; queries rank the coarse centroids, probe their nProbe=2
  // nearest lists, and ADC-scan only the PQ codes in those lists — the
  // q51 full scan cut to nProbe/nLists, and at scale a partition-pruned
  // read when codes are laid out by list_id. Same codes as q50, same ADC
  // arithmetic as q51, same (dist, id) lexicographic tiebreaks everywhere.
  private val ivfCoarseIds: Seq[Long] = (30L to 37L)
  private val ivfNProbe = 2

  private def q93IvfPq(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val cb = graft.operators.Quantize.seedCodebook(embs, col("vec_id"),
      col("embedding"), pqSeedIds)
    val coarse = graft.operators.Quantize.seedCodebook(embs, col("vec_id"),
      col("embedding"), ivfCoarseIds)
    // codes + list_id in ONE map-side projection (keep= threads the
    // coarse assignment through the encode staging — no self-join)
    val codes = graft.operators.Quantize.pqEncode(embs, col("vec_id"),
        col("embedding"), cb, pqM, pqDim,
        keep = Seq(graft.operators.Quantize.ivfListCol(col("embedding"),
          coarse).as("list_id")))
      .drop("distortion")
    graft.operators.Quantize.ivfPqTopK(codes,
      embs.filter(col("vec_id") < 5), "vec_id", "embedding",
      coarse, cb, pqM, pqDim, ivfNProbe, k = 3)
  }

  private val q93Sql = {
    val mins = (0 until pqM).map { j =>
      "list_min([" + pqSeedIds.indices.map(c =>
        s"[${pqDistSql(j, s"cb$c")}, $c.0]").mkString(", ") + s"]) AS m$j"
    }.mkString(",\n    ")
    val codeSel = (0 until pqM).map(j => s"CAST(m$j[2] AS INTEGER) AS c$j")
      .mkString(", ")
    def qDist(j: Int, alias: String): String = {
      val lo = j * pqSub + 1
      val hi = lo + pqSub
      val diff = s"[q.qv[i] - $alias.cv[i] for i in range($lo, $hi)]"
      s"list_inner_product($diff, $diff)"
    }
    val adc = (0 until pqM).map(j => qDist(j, s"b$j")).mkString(" + ")
    val cbJoins = (0 until pqM).map(j => s"JOIN cb b$j ON b$j.code = k.c$j")
      .mkString("\n  ")
    val ccCtes = ivfCoarseIds.zipWithIndex.map { case (cid, l) =>
      s"cc$l AS (SELECT v AS cv FROM e WHERE vec_id = $cid)"
    }.mkString(",\n")
    def fullDist(lhs: String, alias: String): String = {
      val diff = s"[$lhs[i] - $alias.cv[i] for i in range(1, $pqDim + 1)]"
      s"list_inner_product($diff, $diff)"
    }
    val assignMin = "list_min([" + ivfCoarseIds.indices.map(l =>
      s"[${fullDist("e.v", s"cc$l")}, $l.0]").mkString(", ") + "])"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$pqCbCtes,
       |$ccCtes,
       |cb AS (${pqSeedIds.indices.map(c => s"SELECT $c AS code, cv FROM cb$c").mkString(" UNION ALL ")}),
       |ccu AS (${ivfCoarseIds.indices.map(l => s"SELECT $l AS list, cv FROM cc$l").mkString(" UNION ALL ")}),
       |p AS (
       |  SELECT e.vec_id,
       |    $mins
       |  FROM e${pqSeedIds.indices.map(c => s" CROSS JOIN cb$c").mkString}),
       |codes AS (SELECT vec_id AS id, $codeSel FROM p),
       |assign AS (
       |  SELECT e.vec_id, CAST($assignMin[2] AS INTEGER) AS list_id
       |  FROM e${ivfCoarseIds.indices.map(l => s" CROSS JOIN cc$l").mkString}),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |pr AS (
       |  SELECT query_id, list FROM (
       |    SELECT q.query_id, c.list, row_number() OVER (
       |      PARTITION BY q.query_id
       |      ORDER BY ${fullDist("q.qv", "c")}, c.list) AS rn
       |    FROM qs q CROSS JOIN ccu c)
       |  WHERE rn <= $ivfNProbe),
       |s AS (
       |  SELECT q.query_id, k.id AS neighbor_id, $adc AS adc
       |  FROM codes k
       |  JOIN assign a ON a.vec_id = k.id
       |  JOIN pr ON pr.list = a.list_id
       |  JOIN qs q ON q.query_id = pr.query_id
       |  $cbJoins
       |  WHERE q.query_id <> k.id)
       |SELECT query_id, rank, neighbor_id, round(adc, 6) AS adc_dist
       |FROM (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY adc, neighbor_id) AS INTEGER) AS rank
       |      FROM s) WHERE rank <= 3""".stripMargin
  }

  // ------------- IVF-PQ with residual encoding (§2.10 embeddings, q94)
  // Full IVFADC: PQ codes quantize each row's RESIDUAL against its
  // assigned coarse centroid, and the residual codebook is the seed
  // rows' own residuals; queries rebuild their ADC tables per probed
  // list from their residual vs that list's centroid. Same probe/scan
  // shape as q93 — the residual flavor is what the published system
  // runs, trading a per-list table rebuild (nProbe × m tiny tables,
  // broadcast side) for materially lower quantization distortion.
  private def q94IvfPqResidual(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val coarse = graft.operators.Quantize.seedCodebook(embs, col("vec_id"),
      col("embedding"), ivfCoarseIds)
    val rb = graft.operators.Quantize.residualSeedCodebook(embs,
      col("vec_id"), col("embedding"), pqSeedIds, coarse)
    val listC = graft.operators.Quantize.ivfListCol(col("embedding"), coarse)
    val codes = graft.operators.Quantize.pqEncode(embs, col("vec_id"),
        graft.operators.Quantize.ivfResidualCol(col("embedding"), coarse,
          listC),
        rb, pqM, pqDim, keep = Seq(listC.as("list_id")))
      .drop("distortion")
    graft.operators.Quantize.ivfPqResidualTopK(codes,
      embs.filter(col("vec_id") < 5), "vec_id", "embedding",
      coarse, rb, pqM, pqDim, ivfNProbe, k = 3)
  }

  /** Oracle SQL for the residual IVFADC shape, parameterized by coarse
    * seed rows, PQ seed rows, and probe count — q94 (literal-path
    * config) and q95 (kernel-path config: both codebooks above the
    * plan-literal ceiling) replay the SAME semantics at different
    * sizes, which is exactly the literal≡kernel claim the oracle
    * certifies. */
  private def mkIvfResidualSql(coarseIds: Seq[Long], seedIds: Seq[Long],
                               nProbe: Int): String = {
    // codebooks as RELATIONS (code = vec_id − first, ids are contiguous
    // ranges), argmins via arg_min over a cross join — one CTE per
    // codebook instead of one per CODE, so the oracle stays a bounded
    // handful of parquet scans at any codebook size (the per-code-CTE
    // form exhausted DuckDB's file handles at 64×64)
    require(coarseIds == (coarseIds.head to coarseIds.last) &&
      seedIds == (seedIds.head to seedIds.last),
      "oracle codebook ids must be contiguous ranges")
    def fullDist(lhs: String, alias: String): String = {
      val diff = s"[$lhs[i] - $alias.cv[i] for i in range(1, $pqDim + 1)]"
      s"list_inner_product($diff, $diff)"
    }
    // per-subspace distance of a residual column vs a residual centroid
    def resDist(lhs: String, j: Int, alias: String): String = {
      val lo = j * pqSub + 1
      val hi = lo + pqSub
      val diff = s"[$lhs[i] - $alias.cv[i] for i in range($lo, $hi)]"
      s"list_inner_product($diff, $diff)"
    }
    val codeMins = (0 until pqM).map(j =>
      s"CAST(list_min(list([${resDist("er.rv", j, "r")}, r.code * 1.0]))[2] " +
        s"AS INTEGER) AS c$j").mkString(",\n    ")
    val adc = (0 until pqM).map(j => resDist("qr.rv", j, s"b$j"))
      .mkString(" + ")
    val rbJoins = (0 until pqM).map(j => s"JOIN rbu b$j ON b$j.code = k.c$j")
      .mkString("\n  ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cbu AS (SELECT vec_id - ${seedIds.head} AS code, v AS cv FROM e
       |        WHERE vec_id BETWEEN ${seedIds.head} AND ${seedIds.last}),
       |ccu AS (SELECT CAST(vec_id - ${coarseIds.head} AS INTEGER) AS list, v AS cv FROM e
       |        WHERE vec_id BETWEEN ${coarseIds.head} AND ${coarseIds.last}),
       |assign AS (
       |  SELECT e.vec_id,
       |    CAST(list_min(list([${fullDist("e.v", "c")}, c.list * 1.0]))[2]
       |      AS INTEGER) AS list_id
       |  FROM e CROSS JOIN ccu c GROUP BY e.vec_id),
       |rbu AS (
       |  SELECT b.code, [b.cv[i] - c.cv[i] for i in range(1, $pqDim + 1)] AS cv
       |  FROM cbu b JOIN assign a ON a.vec_id = b.code + ${seedIds.head}
       |  JOIN ccu c ON c.list = a.list_id),
       |er AS (
       |  SELECT e.vec_id, a.list_id,
       |    [e.v[i] - c.cv[i] for i in range(1, $pqDim + 1)] AS rv
       |  FROM e JOIN assign a ON a.vec_id = e.vec_id
       |  JOIN ccu c ON c.list = a.list_id),
       |codes AS (
       |  SELECT er.vec_id AS id, er.list_id,
       |    $codeMins
       |  FROM er CROSS JOIN rbu r GROUP BY er.vec_id, er.list_id),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |pr AS (
       |  SELECT query_id, list FROM (
       |    SELECT q.query_id, c.list, row_number() OVER (
       |      PARTITION BY q.query_id
       |      ORDER BY ${fullDist("q.qv", "c")}, c.list) AS rn
       |    FROM qs q CROSS JOIN ccu c)
       |  WHERE rn <= $nProbe),
       |qr AS (
       |  SELECT pr.query_id, pr.list,
       |    [q.qv[i] - c.cv[i] for i in range(1, $pqDim + 1)] AS rv
       |  FROM pr JOIN qs q ON q.query_id = pr.query_id
       |  JOIN ccu c ON c.list = pr.list),
       |s AS (
       |  SELECT qr.query_id, k.id AS neighbor_id, $adc AS adc
       |  FROM codes k
       |  JOIN qr ON qr.list = k.list_id
       |  $rbJoins
       |  WHERE qr.query_id <> k.id)
       |SELECT query_id, rank, neighbor_id, round(adc, 6) AS adc_dist
       |FROM (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY adc, neighbor_id) AS INTEGER) AS rank
       |      FROM s) WHERE rank <= 3""".stripMargin
  }

  private val q94Sql = mkIvfResidualSql(ivfCoarseIds, pqSeedIds, ivfNProbe)

  // ---------- IVF-PQ above the plan-literal ceiling (§2.10, q95)
  // 64 coarse lists × 64 residual codes: BOTH codebooks exceed
  // maxLiteralCodes, so assignment, probe ranking, residuals, encode,
  // and ADC tables all run through the PqKernels codegen'd expressions
  // (reference-object codebooks, fixed-size generated code) — and the
  // oracle replays the identical semantics relationally, certifying the
  // kernel path end-to-end, not just against the literal path's spec.
  private val q95CoarseIds: Seq[Long] = (100L to 163L)
  private val q95SeedIds: Seq[Long] = (10L to 73L)

  private def q95IvfPqKernel(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val coarse = graft.operators.Quantize.seedCodebook(embs, col("vec_id"),
      col("embedding"), q95CoarseIds)
    val rb = graft.operators.Quantize.residualSeedCodebook(embs,
      col("vec_id"), col("embedding"), q95SeedIds, coarse)
    val listC = graft.operators.Quantize.ivfListCol(col("embedding"), coarse)
    val codes = graft.operators.Quantize.pqEncode(embs, col("vec_id"),
        graft.operators.Quantize.ivfResidualCol(col("embedding"), coarse,
          listC),
        rb, pqM, pqDim, keep = Seq(listC.as("list_id")))
      .drop("distortion")
    graft.operators.Quantize.ivfPqResidualTopK(codes,
      embs.filter(col("vec_id") < 5), "vec_id", "embedding",
      coarse, rb, pqM, pqDim, nProbe = 4, k = 3)
  }

  private val q95Sql = mkIvfResidualSql(q95CoarseIds, q95SeedIds, 4)

  // ---------- streaming IVF-PQ index (§2.10 embeddings, q97)
  // The q95 corpus arriving in 3 micro-batches: each batch residual-
  // encodes map-side against the FIXED codebooks and appends to a
  // list_id-partitioned codes index (ingest layout == serving layout ==
  // the DPP-pruned read). Encoding is a pure per-row function, so the
  // accumulated index equals the batch operator's codes under ANY
  // arrival split — topK over the index must therefore match q95's
  // oracle verbatim.
  private def q97StreamingIvfPq(s: SparkSession, d: String): DataFrame = {
    val dirFile = java.nio.file.Files.createTempDirectory("ivfpq_stream")
      .toFile
    // the returned plan reads the index files — JVM-exit sweep, not an
    // eager delete (Bench reps would orphan state dirs otherwise)
    graft.operators.CacheHygiene.registerForCleanup(dirFile)
    val dir = dirFile.getAbsolutePath
    val embs = Tables.embeddings(s, d)
    val coarse = graft.operators.Quantize.seedCodebook(embs, col("vec_id"),
      col("embedding"), q95CoarseIds)
    val rb = graft.operators.Quantize.residualSeedCodebook(embs,
      col("vec_id"), col("embedding"), q95SeedIds, coarse)
    val mm = embs.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    val lo = mm.getLong(0)
    val span = mm.getLong(1) - lo + 1
    val bounds = Seq(lo, lo + span / 3, lo + 2 * span / 3, Long.MaxValue)
    (0 until 3).foreach { b =>
      graft.streaming.IvfPqStream.ingestBatch(s,
        embs.filter(col("vec_id") >= bounds(b) &&
          col("vec_id") < bounds(b + 1)),
        dir, col("vec_id"), col("embedding"), coarse, rb, pqM, pqDim)
    }
    graft.streaming.IvfPqStream.topK(s, dir,
      embs.filter(col("vec_id") < 5), "vec_id", "embedding",
      coarse, rb, pqM, pqDim, nProbe = 4, k = 3)
  }

  // -------------------------------- stratified sampling (§2.10 corpus ops)
  // Per-language sampling rates over the same deterministic content
  // fingerprint as q48: high-resource langs downsampled hard, low-resource
  // kept — the standard corpus-rebalancing cut, reproducible everywhere.
  private val q52Rates: Seq[(String, Int)] =
    Seq("en" -> 5, "de" -> 10, "es" -> 10, "fr" -> 20, "zh" -> 50)

  private def q52StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val rate = q52Rates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, r).otherwise(acc)
    }
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .filter(pmod(TextExprs.polyFingerprint(col("text")), lit(100L)) < rate)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
  }

  private val q52Sql = {
    val rate = "CASE " + q52Rates.map { case (l, r) =>
      s"WHEN lang = '$l' THEN $r" }.mkString(" ") + " ELSE 0 END"
    s"""SELECT lang, count(*) AS n_sampled FROM documents
       |WHERE length(text) > 0
       |  AND list_reduce(
       |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
       |        (a, c) -> (a * 31 + c) % 1000000007) % 100 < $rate
       |GROUP BY lang""".stripMargin
  }

  // ----------------------------------------- full outer join (§2.7 surface)
  // Per-customer order counts vs lineitem supplier counts, full-outer on
  // the key so rows exclusive to either side survive with nulls.
  private def q53FullOuter(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_orders"))
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    o.join(c, Seq("custkey"), "full_outer")
      .select(col("custkey"), col("n_orders"), col("c_name"))
  }

  private val q53Sql =
    """SELECT COALESCE(o.custkey, c.c_custkey) AS custkey, o.n_orders, c.c_name
      |FROM (SELECT o_custkey AS custkey, count(*) AS n_orders
      |      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) o
      |FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer
      |                 WHERE c_acctbal > 9000) c
      |  ON o.custkey = c.c_custkey""".stripMargin

  // ------------------------------------ corpus curation composition (§2.10)
  // The end-to-end training-set cut, composed from the proven pieces:
  // quality floor (q30's score) → exact dedup keep-min-id (q9) → recall-
  // certain minhash near-dup clusters keep-one-representative (q19/q44).
  // Each stage's semantics are mirrored stage-by-stage in the oracle, so
  // the COMPOSITION — stage order, survivor propagation, which rows the
  // cluster representatives come from — is what gets hash-checked.
  private val q55QualityFloor = 0.4

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

  private def q55CorpusCuration(s: SparkSession, d: String): DataFrame =
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

  private val q55Sql =
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

  // --------------------------------------- KMV distinct sketch (§2.10 ext)
  // Mergeable bounded-memory cardinality estimate over l_partkey. The
  // portable polynomial hash makes the k-set — and so the ESTIMATE itself —
  // a deterministic function of the data: the oracle rebuilds the same
  // k smallest distinct hashes and the same arithmetic, bit for bit
  // (something `approx_count_distinct`'s HLL can never offer an oracle).
  private val q56K = 512

  private def q56KmvDistinct(s: SparkSession, d: String): DataFrame =
    graft.operators.Sketch.kmvDistinct(
      Tables.lineitem(s, d), col("l_partkey"), q56K)

  private val q56Sql = {
    val raw = "list_reduce(list_transform(string_split(CAST(l_partkey AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    // the two bijective mix rounds of Sketch.kmvDistinct, verbatim
    val h = s"((($raw * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    s"""WITH hs AS (SELECT DISTINCT $h AS h FROM lineitem),
       |sk AS (SELECT h FROM hs ORDER BY h LIMIT $q56K)
       |SELECT $q56K AS k, count(*) AS n_in_sketch, max(h) AS kth_min,
       |  round(CASE WHEN count(*) < $q56K THEN CAST(count(*) AS DOUBLE)
       |        ELSE ${(q56K - 1).toDouble} * 1000000007.0 / CAST(max(h) AS DOUBLE)
       |        END, 4) AS est_distinct
       |FROM sk""".stripMargin
  }

  // ------------------------------- exact heavy hitters (§2.10 ext)
  // Hot-token mining over the corpus: per-partition Misra-Gries candidates
  // (bounded memory, candidates-only shuffle) + exact recount. The sketch
  // in the middle is invisible to the oracle: with minShare above the MG
  // guarantee the output is EXACTLY the GROUP BY / HAVING set.
  private val q58MinShare = 0.02

  private def q58HeavyHitters(s: SparkSession, d: String): DataFrame =
    graft.operators.Frequent.heavyHitters(
      Tables.documents(s, d)
        .select(explode(TextExprs.tokens(col("text"))).as("item")),
      col("item"), minShare = q58MinShare, counters = 256)

  private val q58Sql =
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS item
       |  FROM documents WHERE length(trim(text)) > 0),
       |tot AS (SELECT count(*) AS n_total FROM toks)
       |SELECT item, count(*) AS cnt, (SELECT n_total FROM tot) AS n_total
       |FROM toks GROUP BY item
       |HAVING count(*) >=
       |  CAST(ceil($q58MinShare * (SELECT n_total FROM tot)) AS BIGINT)""".stripMargin

  // ------------------------- repetition quality signals (§2.10 ext)
  // Gopher-style per-document repetition stats: distinct-token ratio
  // ingredients and the top word-2gram count — the "is this document
  // degenerate boilerplate" filter of a training-data pipeline. Bigram
  // mode via explode + two-level agg (per-doc key shuffle, map-combined),
  // not per-row O(m²) array scans. Integer outputs hash exactly;
  // `repetitive` mirrors Gopher's top-2gram fraction > 0.2 as an integer
  // comparison (cnt * 5 > n) — no float division in compared output.
  private def q59Repetition(s: SparkSession, d: String): DataFrame = {
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

  private val q59Sql =
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

  // ------------------------- token-budget sharding (§2.10 ext)
  // Global exclusive-prefix-sum sharding without the single-task window:
  // the oracle IS the naive `SUM() OVER (ORDER BY ...)` — the operator
  // must equal it while never moving the table into one task.
  private val q60Budget = 2000L

  private def q60TokenShards(s: SparkSession, d: String): DataFrame =
    graft.operators.Shard.byBudget(
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextExprs.tokenCount(col("text")).cast("long").as("n_tok")),
      orderCol = "doc_id", weightCol = "n_tok", budget = q60Budget)

  private val q60Sql =
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

  // ------------------------------- Z-order layout key (§2.10 ext)
  // Morton interleave of (l_partkey, l_suppkey) — the file-skipping
  // layout key (Layout.writeZOrdered gives every output file a narrow
  // min/max range in BOTH columns). Registered as the key computation
  // itself: pure integer bit arithmetic, identical on any engine. The
  // quantization ranges are data min/max — a 1-row metadata agg on the
  // Spark side, scalar subqueries in the oracle.
  private val q61Bits = 8

  private def q61Zorder(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // 1-row bounds collect: metadata, same class as the seed codebook
    val b = li.agg(
      min(col("l_partkey")).cast("long"), max(col("l_partkey")).cast("long"),
      min(col("l_suppkey")).cast("long"), max(col("l_suppkey")).cast("long"))
      .collect()(0)
    li.select(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"),
      graft.operators.Layout.zValue(col("l_partkey"), col("l_suppkey"),
        b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3),
        bits = q61Bits).as("z"))
  }

  private val q61Sql = {
    val qMax = (1 << q61Bits) - 1
    val inter = (0 until q61Bits).map(i =>
      s"(((qx >> $i) & 1) << ${2 * i}) + (((qy >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    s"""WITH r AS (
       |  SELECT CAST(min(l_partkey) AS BIGINT) AS xlo,
       |         CAST(max(l_partkey) AS BIGINT) AS xhi,
       |         CAST(min(l_suppkey) AS BIGINT) AS ylo,
       |         CAST(max(l_suppkey) AS BIGINT) AS yhi
       |  FROM lineitem),
       |q AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |    ((CAST(l_partkey AS BIGINT) - xlo) * $qMax) // (xhi - xlo) AS qx,
       |    ((CAST(l_suppkey AS BIGINT) - ylo) * $qMax) // (yhi - ylo) AS qy
       |  FROM lineitem, r)
       |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  CAST($inter AS BIGINT) AS z
       |FROM q""".stripMargin
  }

  // ------------------------- benchmark decontamination (§2.10 ext)
  // Test-set contamination check (the GPT-3-paper decontamination step):
  // per corpus doc, the fraction of its distinct 3-gram shingles that
  // appear in ANY benchmark doc. Benchmark sets are tiny vs a 100 TB
  // corpus, so the benchmark shingle set broadcasts and the corpus scan
  // stays map-side: one explode + one map-combined groupBy, no corpus
  // shuffle by shingle. Integer outputs; `contaminated` = overlap >= 0.5
  // as an integer comparison.
  private val q62BenchMod = 50L

  // Plan-shape notes (measured at sf0.1): the doc_id split sits BELOW the
  // shingle projection and explode runs directly on the shingle
  // expression, so each side shingles its own rows exactly once — a
  // `size(sh) > 0` pre-filter over a shared projection re-evaluated the
  // shingles per consumer (6.7 s; the repo's #1 recurring hazard). Join
  // keys are 128-bit shingle hashes (3.3-4.1 s; string-join within
  // noise, kept for the broadcast-size win). Hashing token windows
  // inside the shingle HOF measured clearly WORSE (6.2 s — per-window
  // array slice + array hash beats building each string once only in
  // theory) and was rejected.
  private def q62Decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Contamination.overlapVsBenchmark(
      corpus = docs.filter(col("doc_id") % q62BenchMod =!= 0),
      benchmark = docs.filter(col("doc_id") % q62BenchMod === 0),
      id = col("doc_id"), text = col("text"), n = 3)
  }

  private val q62Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
       |  )) AS s FROM toks WHERE len(ts) > 0),
       |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % $q62BenchMod = 0),
       |corp AS (SELECT doc_id, s FROM sh WHERE doc_id % $q62BenchMod <> 0)
       |SELECT doc_id, count(*) AS n_shingles, count(b.s) AS n_overlap,
       |  count(b.s) * 2 >= count(*) AS contaminated
       |FROM corp LEFT JOIN bench b ON corp.s = b.s
       |GROUP BY doc_id""".stripMargin

  // ---------- bloom-gated decontamination (§2.10 ext, q96)
  // Same semantics as q62, different scale regime: the benchmark
  // shingle set is represented as a Bloom filter (~10 bits/element,
  // Spark's distributed sketch aggregate) and only bloom survivors
  // enter the exact confirmation join — the shape for benchmark sets
  // too large to broadcast as exact hashes. No false negatives + exact
  // confirm ⇒ output identical to q62, so the q62 oracle certifies it.
  private def q96BloomDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Contamination.overlapVsBenchmarkBloom(
      corpus = docs.filter(col("doc_id") % q62BenchMod =!= 0),
      benchmark = docs.filter(col("doc_id") % q62BenchMod === 0),
      id = col("doc_id"), text = col("text"), n = 3)
  }

  // Dense global row ids without a single-task window: Shard.byBudget
  // with unit weights and budget 1 IS zipWithIndex under a total order —
  // the training-example-id assignment primitive, same two-phase prefix
  // sum, oracle = row_number() - 1.
  private def q63GlobalRowIds(s: SparkSession, d: String): DataFrame =
    graft.operators.Shard.byBudget(
      Tables.documents(s, d)
        .select(col("doc_id"), lit(1L).as("one")),
      orderCol = "doc_id", weightCol = "one", budget = 1L)
      .select(col("doc_id"), col("shard").as("row_idx"))

  private val q63Sql =
    """SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) - 1 AS row_idx
      |FROM documents""".stripMargin

  // ------------------------- per-group KMV sketch (§2.10 ext)
  // Distinct users per event type as a mergeable sketch aggregation: one
  // k-bounded set per (partition, group) — the full distinct (group, key)
  // set never shuffles, which is the entire point at 100 TB. Same
  // portable hash as q56, so the per-group k-sets — and the estimates —
  // are bit-for-bit oracle-checkable.
  private val q64K = 64

  private def q64KmvByGroup(s: SparkSession, d: String): DataFrame =
    graft.operators.Sketch.kmvDistinctByGroup(
      Tables.events(s, d), col("event_type"), col("user_id"), q64K)

  private val q64Sql = {
    val raw = "list_reduce(list_transform(string_split(CAST(user_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val h = s"((($raw * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    s"""WITH hs AS (
       |  SELECT DISTINCT event_type AS grp, $h AS h FROM events
       |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
       |sk AS (SELECT grp, h,
       |       row_number() OVER (PARTITION BY grp ORDER BY h) AS r FROM hs)
       |SELECT grp, $q64K AS k, count(*) AS n_in_sketch, max(h) AS kth_min,
       |  round(CASE WHEN count(*) < $q64K THEN CAST(count(*) AS DOUBLE)
       |        ELSE ${(q64K - 1).toDouble} * 1000000007.0 / CAST(max(h) AS DOUBLE)
       |        END, 4) AS est_distinct
       |FROM sk WHERE r <= $q64K GROUP BY grp""".stripMargin
  }

  // ------------------- incremental KMV over micro-batches (§2.10 ext)
  // The sketch counterpart of q57: lineitem arrives as 3 batches, each
  // merged into a k-long parquet state. KMV merge is associative
  // union-truncate, so the final state — and the estimate — is
  // BIT-IDENTICAL to the batch sketch for any arrival split: q65 shares
  // q56's oracle verbatim.
  private def q65StreamingKmv(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("kmv_stream")
      .toString + "/state"
    val li = Tables.lineitem(s, d)
    (0 until 3).foreach { b =>
      graft.operators.Sketch.kmvIngestBatch(
        li.filter(col("l_orderkey") % 3 === b), col("l_partkey"), q56K, state)
    }
    graft.operators.Sketch.kmvFromState(s, state, q56K)
  }

  // -------------------- exact duplicated n-gram spans (§2.10 ext)
  // The "exact substring dedup" pass of Lee et al. 2021 at token
  // granularity: per doc, how many token positions sit under a k-gram
  // that occurs ≥ 2 times anywhere in the corpus. All-integer output;
  // the oracle rebuilds the same grams with a DuckDB list comprehension
  // and the same coverage union.
  private val q66K = 8

  private def q66DupSpans(s: SparkSession, d: String): DataFrame =
    Dedup.dupNgramSpans(Tables.documents(s, d), col("doc_id"), col("text"),
      k = q66K)

  private val q66Sql = {
    val k = q66K
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |b AS (SELECT doc_id, len(ts) AS n_tokens, ts FROM toks),
       |g AS (
       |  SELECT doc_id, i - 1 AS pos, array_to_string(ts[i:i+${k - 1}], ' ') AS gram
       |  FROM b, UNNEST(range(1, n_tokens - ${k - 2})) AS u(i)
       |  WHERE n_tokens >= $k),
       |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
       |pd AS (
       |  SELECT g.doc_id, count(*) AS n_dup_grams,
       |    len(list_distinct(flatten(
       |      list(range(pos, pos + $k) ORDER BY pos)))) AS n_dup_tokens
       |  FROM g JOIN d USING (gram) GROUP BY g.doc_id)
       |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       |  CAST(greatest(b.n_tokens - ${k - 1}, 0) AS BIGINT) AS n_grams,
       |  COALESCE(pd.n_dup_grams, 0) AS n_dup_grams,
       |  CAST(COALESCE(pd.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens
       |FROM b LEFT JOIN pd ON b.doc_id = pd.doc_id""".stripMargin
  }

  // ------------------- deterministic quantile sketch (§2.10 ext)
  // Bottom-k-by-portable-hash row sample → exact rank pick: a mergeable
  // quantile estimator (O(1/√k) rank error) whose sample — and therefore
  // every estimate — is a deterministic function of the data, so the
  // oracle rebuilds it exactly. Complements q56/q64 (distinct count) and
  // q58 (heavy hitters) in the sketch family.
  private val q67K = 256
  private val q67Probs = Seq(0.5, 0.9, 0.99)

  private def q67QuantileSketch(s: SparkSession, d: String): DataFrame =
    graft.operators.Sketch.quantileSketch(
      Tables.lineitem(s, d), col("l_extendedprice"),
      col("l_orderkey") * 10 + col("l_linenumber"), q67K, q67Probs)

  private val q67Sql = {
    val raw = "list_reduce(list_transform(string_split(" +
      "CAST(l_orderkey * 10 + l_linenumber AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val h = s"((($raw * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    val vals = q67Probs.map(p => s"(CAST($p AS DOUBLE))").mkString(", ")
    s"""WITH hv AS (
       |  SELECT DISTINCT $h AS h, CAST(l_extendedprice AS DOUBLE) AS v
       |  FROM lineitem),
       |sel AS (SELECT h, v, row_number() OVER (ORDER BY h, v) AS rn FROM hv
       |        QUALIFY rn <= $q67K),
       |s AS (SELECT v, row_number() OVER (ORDER BY v, h) AS qrn FROM sel),
       |n AS (SELECT max(qrn) AS n_sample FROM s)
       |SELECT p.prob, s.v AS est_value,
       |  CAST(n.n_sample AS BIGINT) AS n_sample, $q67K AS k
       |FROM (VALUES $vals) p(prob) CROSS JOIN n
       |JOIN s ON s.qrn = CAST(ceil(p.prob * n.n_sample) AS INTEGER)""".stripMargin
  }

  // --------------------------- BM25 top-k retrieval (§2.10 ext)
  // Okapi BM25 with the Robertson idf over fixed term queries — the
  // lexical-retrieval primitive (decontamination lookups, seed-doc
  // expansion). Query terms are plan-time literals, so each score is one
  // fixed-order scalar expression the oracle replays verbatim — including
  // the ln, whose cross-engine last-ulp risk is absorbed by round(…, 4)
  // (score is ranked on the rounded value with a doc-id tie-break).
  private val q68Queries: Seq[(String, Seq[String])] = Seq(
    "narrow" -> Seq("spark", "window"),
    "mixed" -> Seq("customer", "fast", "join"),
    "stop" -> Seq("the", "scan"))
  private val q68K1 = 1.2
  private val q68B = 0.75
  private val q68TopK = 5

  private def q68Bm25(s: SparkSession, d: String): DataFrame =
    graft.operators.Bm25.topK(Tables.documents(s, d), col("doc_id"),
      col("text"), q68Queries, q68K1, q68B, q68TopK)

  // Full BM25 top-k SQL, parameterized so q124's hybrid-fusion oracle can
  // reuse the identical scoring plan at a different depth.
  private def bm25SqlFor(queries: Seq[(String, Seq[String])],
      k1: Double, b: Double, topK: Int): String = {
    val terms = queries.flatMap(_._2).distinct
    val dfIdx = terms.zipWithIndex.toMap
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN list_contains(ts, '$t') THEN 1 ELSE 0 END) AS df_$i"
    }.mkString(",\n      ")
    val k1p1 = (k1 + 1.0).toString
    val oneMinusB = (1.0 - b).toString
    def contrib(t: String): String = {
      val df = s"CAST(df_${dfIdx(t)} AS DOUBLE)"
      val tf = s"CAST(len(list_filter(ts, x -> x = '$t')) AS DOUBLE)"
      s"ln(((CAST(n_docs AS DOUBLE) - $df + 0.5) / ($df + 0.5)) + 1.0) * " +
        s"(($tf * $k1p1) / ($tf + $k1 * ($oneMinusB + $b * " +
        s"(CAST(len(ts) AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"
    }
    val scoreCols = queries.zipWithIndex.map { case ((_, ts), i) =>
      ts.map(contrib).mkString(" + ") + s" AS s$i"
    }.mkString(",\n      ")
    val union = queries.zipWithIndex.map { case ((qid, _), i) =>
      s"SELECT '$qid' AS query_id, doc_id, round(s$i, 4) AS score FROM sc"
    }.mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |st AS (SELECT count(*) AS n_docs, sum(CAST(len(ts) AS BIGINT)) AS sum_dl,
       |      $dfAggs
       |    FROM toks),
       |sc AS (SELECT doc_id,
       |      $scoreCols
       |    FROM toks CROSS JOIN st),
       |u AS ($union),
       |r AS (SELECT query_id, doc_id, score, row_number() OVER (
       |        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |      FROM u)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score
       |FROM r WHERE rank <= $topK""".stripMargin
  }

  private val q68Sql = bm25SqlFor(q68Queries, q68K1, q68B, q68TopK)

  // ----------------------------- PII redaction (§2.10 ext)
  // Ordered-class scrubbing (email → ip → phone → number) with per-class
  // match counts — the privacy pass of a training-data pipeline. Patterns
  // live in TextExprs.piiPatterns (Java∩RE2 subset) and the oracle SQL is
  // GENERATED from the same list, one CTE per class, so Spark and DuckDB
  // replay the identical replace cascade. The events.props JSON exercises
  // the number class on real data; all classes are unit-spec'd.
  private def q69PiiRedact(s: SparkSession, d: String): DataFrame = {
    val counts = TextExprs.piiCounts(col("props")).as("c")
    Tables.events(s, d)
      .select(col("event_id"), counts,
        TextExprs.piiRedact(col("props")).as("redacted"))
      .select(col("event_id"), col("c.n_email"), col("c.n_ip"),
        col("c.n_phone"), col("c.n_number"), col("redacted"))
  }

  private val q69Sql = {
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

  // ----------------------------- count-min sketch (§2.10 ext)
  // Point-frequency estimation over the token stream: depth×width bounded
  // counters (the shuffle is O(depth×width), never O(tokens)), probes
  // replayed through the same affine hash rows, est >= exact by
  // construction. The oracle rebuilds every counter from the portable
  // fingerprint — a frequency sketch you can hash-check.
  private val q70Depth = 3
  private val q70Width = 16 // narrow on purpose: collisions make est > exact visible
  private val q70Probes =
    Seq("table", "spark", "the", "vector", "unseen_token_xyz")

  private def q70CountMin(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(TextExprs.tokens(col("text"))).as("tok"))
    graft.operators.Sketch.countMinEstimates(
      toks, col("tok"), q70Depth, q70Width, q70Probes)
  }

  private val q70Sql = {
    def poly(c: String) =
      s"list_reduce(list_transform(string_split($c, ''), " +
        "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val hp = graft.operators.Sketch.countMinHashParams.take(q70Depth)
      .zipWithIndex.map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val pr = q70Probes.map(t => s"('$t')").mkString(", ")
    s"""WITH toks AS (
       |  SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |       ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
       |  FROM documents),
       |hp(i, a, b) AS (VALUES $hp),
       |fp AS (SELECT tok, ${poly("tok")} AS f FROM toks),
       |cnt AS (SELECT i, ((f * a + b) % 1000000007) % $q70Width AS bucket,
       |      count(*) AS c
       |    FROM fp CROSS JOIN hp GROUP BY 1, 2),
       |pr(token) AS (VALUES $pr),
       |pb AS (SELECT token, i,
       |      ((${poly("token")} * a + b) % 1000000007) % $q70Width AS bucket
       |    FROM pr CROSS JOIN hp),
       |est AS (SELECT token, min(coalesce(c, 0)) AS est
       |    FROM pb LEFT JOIN cnt USING (i, bucket) GROUP BY token),
       |ex AS (SELECT tok AS token, count(*) AS exact FROM toks GROUP BY 1)
       |SELECT token, est, coalesce(exact, 0) AS exact
       |FROM est LEFT JOIN ex USING (token)""".stripMargin
  }

  // ----------------------------- vocab induction + bigram LM (§2.10 ext)
  // One BPE-training merge round (top adjacent-pair counts, distributed
  // top-k) and the per-doc bigram-MLE NLL quality signal built from the
  // same pair stream. Shared CTEs on the oracle side mirror the shared
  // explode on the Spark side.
  private val q71TopK = 20

  private def q71BpePairs(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.topPairs(
      Tables.documents(s, d), col("text"), q71TopK)

  private val q71TokensCte =
    """WITH toks AS (
      |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |       ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
      |  FROM documents)""".stripMargin

  private val q71PairsCte =
    s"""$q71TokensCte,
       |pairs AS (
       |  SELECT doc_id, ts[i] AS l_tok, ts[i + 1] AS r_tok
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks))""".stripMargin

  private val q71Sql =
    s"""$q71PairsCte,
       |cnt AS (SELECT l_tok, r_tok, count(*) AS n FROM pairs GROUP BY 1, 2),
       |r AS (SELECT l_tok, r_tok, n, row_number() OVER (
       |        ORDER BY n DESC, l_tok, r_tok) AS rank FROM cnt)
       |SELECT CAST(rank AS INTEGER) AS rank, l_tok, r_tok, n
       |FROM r WHERE rank <= $q71TopK""".stripMargin

  private def q72BigramNll(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.bigramNll(
      Tables.documents(s, d), col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")

  private val q72Sql =
    s"""$q71PairsCte,
       |cnt AS (SELECT l_tok, r_tok, count(*) AS c_lr FROM pairs GROUP BY 1, 2),
       |cl AS (SELECT l_tok, r_tok, c_lr,
       |      sum(c_lr) OVER (PARTITION BY l_tok) AS c_l FROM cnt),
       |sc AS (SELECT p.doc_id, ln(CAST(c_lr AS DOUBLE) / CAST(c_l AS DOUBLE)) AS ll
       |       FROM pairs p JOIN cl USING (l_tok, r_tok))
       |SELECT doc_id, count(*) AS n_bigrams,
       |  round(-sum(ll) / count(*), 4) AS avg_nll
       |FROM sc GROUP BY doc_id""".stripMargin

  // ----------------------------- mixture sampling (§2.10 ext)
  // Per-source token-budget downsampling: integer keep-rate from the
  // group totals, portable-hash keep decision — the corpus never
  // shuffles, and the oracle replays every row's decision.
  private val q73Budget = 800L
  private val q73Scale = 10000

  private def q73MixSample(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.sampleToBudget(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextExprs.tokenCount(col("text")).as("n_toks")),
      col("doc_id"), col("source"), col("n_toks"), q73Budget, q73Scale)
      .select(col("id").as("doc_id"), col("grp").as("source"),
        col("w").as("n_toks"), col("rate_bp"))

  private val q73Sql = {
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

  // ----------------------------- sequence packing (§2.10 ext)
  // Fixed-length training-example assembly: distributed prefix offsets
  // (Shard.byBudget, unit budget) + map-side span explode. The oracle IS
  // the single-task running-sum window the operator avoids.
  private val q74SeqLen = 128

  private def q74PackExamples(s: SparkSession, d: String): DataFrame =
    graft.operators.Pack.packExamples(
      Tables.documents(s, d)
        .select(col("doc_id"), TextExprs.tokenCount(col("text")).as("n_toks")),
      "doc_id", "n_toks", q74SeqLen)
      .select(col("doc_id"), col("example_id"), col("tok_start"), col("tok_len"))

  private val q74Sql =
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

  // ----------------------- streaming heavy hitters (§2.10 ext)
  // Incremental Misra-Gries over micro-batches: three arrival batches
  // (doc_id mod 3) ingest into one compressed MG state (≤ counters+1
  // parquet rows); the exact recount against the accumulated corpus
  // equals the batch operator's output for ANY arrival split — q75
  // shares q58's oracle, like q65 shares q56's.
  private def q75StreamingHh(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("mg_stream")
      .toString + "/state"
    val toks = (b: Int) => Tables.documents(s, d)
      .filter(col("doc_id") % 3 === b)
      .select(explode(TextExprs.tokens(col("text"))).as("item"))
    (0 until 3).foreach { b =>
      graft.operators.Frequent.mgIngestBatch(
        toks(b), col("item"), counters = 256, state)
    }
    graft.operators.Frequent.heavyHittersFromState(state,
      Tables.documents(s, d)
        .select(explode(TextExprs.tokens(col("text"))).as("item")),
      col("item"), minShare = q58MinShare, counters = 256)
  }

  // ----------------------- streaming quantile sketch (§2.10 ext)
  // Incremental bottom-k-by-hash over micro-batches: union-then-truncate
  // state is bit-identical to the batch sample for any arrival split, so
  // q76 shares q67's oracle — completing the streaming-sketch family
  // (q65 KMV, q75 Misra-Gries, q76 quantiles).
  private def q76StreamingQuantile(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("qt_stream")
      .toString + "/state"
    val li = Tables.lineitem(s, d)
    (0 until 3).foreach { b =>
      graft.operators.Sketch.quantileIngestBatch(
        li.filter(col("l_orderkey") % 3 === b), col("l_extendedprice"),
        col("l_orderkey") * 10 + col("l_linenumber"), q67K, state)
    }
    graft.operators.Sketch.quantilesFromState(s, state, q67K, q67Probs)
  }

  // ----------------- hashed linear classifier inference (§2.10 ext)
  // fastText-style quality-filter scoring: D hashed buckets, plan-literal
  // weights, decimal-exact mean, one sigmoid. The model weights are
  // deterministic pseudo-random values rounded to 6 decimals (exactly
  // representable in decimal(28,12)), rendered as literals into BOTH the
  // Spark plan and the oracle SQL — the oracle never re-derives them.
  private val q77D = 64
  private val q77Bias = -0.1
  private val q77Weights: Seq[Double] = {
    val rng = new scala.util.Random(13)
    Seq.fill(q77D)(math.rint(rng.nextGaussian() * 1e6) / 1e6)
  }

  private def q77LinearScore(s: SparkSession, d: String): DataFrame =
    graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
      .withColumnRenamed("id", "doc_id")

  /** q77's oracle parametrized by model literals — shared by every query
    * that rescores the corpus under a (possibly different) frozen model
    * (q77 and the q162 churn pair). */
  private def linearScoreSql(weights: Seq[Double], bias: Double): String = {
    val poly = "list_reduce(list_transform(string_split(tok, ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val values = weights.zipWithIndex.map { case (w, i) =>
      s"($i, CAST($w AS DECIMAL(28,12)))"
    }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents WHERE length(trim(text)) > 0),
       |w(bucket, wv) AS (VALUES $values),
       |b AS (SELECT doc_id, $poly % ${weights.length} AS bucket FROM toks),
       |sc AS (SELECT doc_id, count(*) AS n_toks,
       |      CAST(sum(wv) AS DOUBLE) AS z
       |    FROM b JOIN w USING (bucket) GROUP BY doc_id)
       |SELECT doc_id, n_toks,
       |  round(1.0 / (1.0 + exp(-($bias + z / CAST(n_toks AS DOUBLE)))), 4)
       |    AS score
       |FROM sc""".stripMargin
  }

  private val q77Sql = linearScoreSql(q77Weights, q77Bias)

  // ------------------- streaming count-min sketch (§2.10 ext)
  // Counter addition is exact, so the merged micro-batch state is
  // bit-identical to the batch counter table for any arrival split —
  // q78 shares q70's oracle, closing the streaming-sketch family
  // (q65 KMV, q75 MG, q76 quantiles, q78 count-min).
  private def q78StreamingCountmin(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("cm_stream")
      .toString + "/state"
    val toks = (b: Int) => Tables.documents(s, d)
      .filter(col("doc_id") % 3 === b)
      .select(explode(TextExprs.tokens(col("text"))).as("tok"))
    (0 until 3).foreach { b =>
      graft.operators.Sketch.countMinIngestBatch(
        toks(b), col("tok"), q70Depth, q70Width, state)
    }
    graft.operators.Sketch.countMinEstimatesFromState(state,
      Tables.documents(s, d)
        .select(explode(TextExprs.tokens(col("text"))).as("tok")),
      col("tok"), q70Depth, q70Width, q70Probes)
  }

  // ------------------------ interchange formats (§2.10 edges)
  // ORC round-trip under the q1 aggregation: lineitem is exported to ORC
  // (hive-partitioned) and read back with an EXPLICIT schema — no
  // inference job — then aggregated. Sharing q1's oracle pins that the
  // format edge is content-transparent.
  private def q79FormatRoundtrip(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d)
    val dir = java.nio.file.Files.createTempDirectory("orc_rt")
      .toString + "/lineitem"
    graft.sources.Formats.write(base, dir, "orc",
      partitionBy = Seq("l_returnflag"))
    graft.sources.Formats.read(s, dir, "orc", base.schema)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"))
  }

  // ----------------- per-window heavy hitters / trending (§2.10 ext)
  // Hot users per day-window of the event stream: Misra-Gries per
  // (partition, window) with a fully relational candidate/threshold
  // path — no driver summary — and an exact recount, so the output IS
  // the per-window GROUP BY/HAVING the oracle runs.
  private val q80WindowSec = 86400L
  private val q80MinShare = 0.02

  private def q80TrendingUsers(s: SparkSession, d: String): DataFrame =
    graft.operators.Frequent.heavyHittersByWindow(
      Tables.events(s, d), col("ts"), col("user_id"),
      q80WindowSec, q80MinShare, counters = 128)

  private val q80Sql =
    s"""WITH w AS (SELECT CAST(floor(epoch(ts)/$q80WindowSec) AS BIGINT)*$q80WindowSec AS w_start,
       |    CAST(user_id AS VARCHAR) AS item FROM events),
       |t AS (SELECT w_start, count(*) AS n_total FROM w GROUP BY 1),
       |c AS (SELECT w_start, item, count(*) AS cnt FROM w GROUP BY 1, 2)
       |SELECT c.w_start, item, cnt, n_total FROM c JOIN t USING (w_start)
       |WHERE cnt >= CAST(ceil($q80MinShare * n_total) AS BIGINT)""".stripMargin

  // -------------------- per-group quantile sketch (§2.10 ext)
  // Price quantiles per return flag at sketch cost: one k-bounded
  // (hash, value) set per (partition, group) — the same sketch-by-key
  // contract as q64 — with every window PARTITIONED BY group. The
  // oracle replays the identical per-group sample.
  private val q81K = 128

  private def q81QuantilesByGroup(s: SparkSession, d: String): DataFrame =
    graft.operators.Sketch.quantileSketchByGroup(
      Tables.lineitem(s, d), col("l_returnflag"), col("l_extendedprice"),
      col("l_orderkey") * 10 + col("l_linenumber"), q81K, q67Probs)

  private val q81Sql = {
    val raw = "list_reduce(list_transform(string_split(" +
      "CAST(l_orderkey * 10 + l_linenumber AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val h = s"((($raw * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    val pv = q67Probs.map(p => s"($p)").mkString(", ")
    s"""WITH hv AS (SELECT l_returnflag AS grp, $h AS h,
       |      CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
       |d AS (SELECT DISTINCT grp, h, v FROM hv),
       |r AS (SELECT grp, h, v, row_number() OVER (
       |        PARTITION BY grp ORDER BY h, v) AS rn FROM d),
       |s AS (SELECT grp, h, v, row_number() OVER (
       |        PARTITION BY grp ORDER BY v, h) AS qrn
       |      FROM r WHERE rn <= $q81K),
       |n AS (SELECT grp, max(qrn) AS n_sample FROM s GROUP BY grp),
       |p(prob) AS (VALUES $pv)
       |SELECT s.grp, prob, v AS est_value,
       |  CAST(n.n_sample AS BIGINT) AS n_sample, $q81K AS k
       |FROM p CROSS JOIN n JOIN s ON s.grp = n.grp
       |  AND s.qrn = CAST(ceil(prob * n.n_sample) AS INTEGER)""".stripMargin
  }

  // ----------------------------- multi-round BPE training (§2.10 ext)
  // K full merge rounds with pair re-derivation over the merged token
  // sequences — the real tokenizer-training loop (Sennrich et al. 2016),
  // not just round 1's counts (q71). The oracle replays every round as an
  // unrolled CTE chain on the wrapped-string form: tokens bracketed by
  // chr(1)/chr(2) make one standard `replace` the exact greedy
  // left-to-right non-overlapping merge in BOTH engines.
  private val q82Rounds = 8

  private def q82BpeTrain(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.bpeTrain(
      Tables.documents(s, d), col("text"), q82Rounds)

  /** The unrolled K-round CTE chain shared by q82 (training output = the
    * m_i merge rows) and q83 (encoding output = the r_K merged strings,
    * carrying doc_id and the raw token count through every round). */
  private val q82Ctes = {
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

  private val q82Sql = {
    val unioned = (1 to q82Rounds)
      .map(i => s"SELECT $i AS round, l_tok, r_tok, n FROM m$i")
      .mkString("\n  UNION ALL ")
    // q82Ctes is already margin-stripped — re-stripping would eat the
    // leading "||" continuation lines down to a single "|"
    q82Ctes + "\nSELECT CAST(round AS INTEGER) AS round, l_tok, r_tok, n " +
      s"FROM (\n  $unioned)"
  }

  private def q83BpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = graft.operators.Vocab
      .bpeTrain(docs, col("text"), q82Rounds)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.operators.Vocab.bpeEncode(docs, col("doc_id"), col("text"), merges)
      .withColumnRenamed("id", "doc_id")
  }

  private val q83Sql =
    q82Ctes + s"""
SELECT doc_id, CAST(n_raw AS BIGINT) AS n_raw,
  CAST(length(s) - length(replace(s, chr(1), '')) AS BIGINT) AS n_bpe,
  round(CAST(n_raw AS DOUBLE) /
        (length(s) - length(replace(s, chr(1), ''))), 4) AS compression
FROM r$q82Rounds"""

  // ----------------------------- document chunking (§2.10 ext)
  // Fixed-size token windows with overlap — the context-length prep stage
  // before packing, and the RAG index unit. Map-side only; the oracle
  // replays window arithmetic and the space-rejoin exactly.
  private val q84Size = 64
  private val q84Overlap = 16

  private def q84Chunks(s: SparkSession, d: String): DataFrame =
    graft.operators.Chunk.tokenChunks(Tables.documents(s, d),
        col("doc_id"), col("text"), q84Size, q84Overlap)
      .withColumnRenamed("id", "doc_id")

  private val q84Sql = {
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

  // ----------------------------- kNN classification (§2.10 ext)
  // Majority vote of the 5 nearest labeled embeddings — the semantic
  // seed-set filtering primitive. Shares q21's exact-cosine/rank replay;
  // the vote and its smallest-label tie-break are total orders.
  private def q85KnnClassify(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.operators.Similarity.knnClassify(emb,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", "label", k = 5)
  }

  private val q85Sql =
    """WITH e AS (SELECT vec_id, label,
      |            CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |s AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS lab,
      |    list_inner_product(q.qv, e.v) /
      |      (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(e.v, e.v))) AS c
      |  FROM e CROSS JOIN q WHERE q.query_id <> e.vec_id),
      |r AS (SELECT query_id, lab, row_number() OVER (
      |        PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
      |      FROM s),
      |v AS (SELECT query_id, lab, count(*) AS votes
      |      FROM r WHERE rank <= 5 GROUP BY 1, 2)
      |SELECT query_id, pred_label, votes FROM (
      |  SELECT query_id, lab AS pred_label, votes, row_number() OVER (
      |    PARTITION BY query_id ORDER BY votes DESC, lab) AS rr FROM v)
      |WHERE rr = 1""".stripMargin

  // ----------------------------- text normalization (§2.10 ext)
  // Canonical form before dedup/fingerprinting: NFC (codegen'd kernel),
  // lowercase, control chars → space, whitespace collapse, trim. The
  // oracle replays the identical chain with DuckDB's nfc_normalize.
  private def q86Normalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      graft.functions.TextExprs.normalizeText(col("text")).as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))

  private val q86Sql =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(
      |    lower(nfc_normalize(text)), '[[:cntrl:]]', ' ', 'g'),
      |    '\s+', ' ', 'g')) AS norm_text,
      |  CAST(length(trim(regexp_replace(regexp_replace(
      |    lower(nfc_normalize(text)), '[[:cntrl:]]', ' ', 'g'),
      |    '\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm
      |FROM documents""".stripMargin

  // ----------------------------- train/val/test split (§2.10 ext)
  // Deterministic 90/5/5 assignment by portable id-hash buckets — held-out
  // sets stay held out across dataset versions because a row's split is a
  // pure function of its id. The oracle replays the hash fold.
  private def q87Splits(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.assignSplits(
        Tables.documents(s, d).select(col("doc_id")), col("doc_id"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select(col("doc_id"), col("split"))

  private val q87Sql = {
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

  // ----------------------------- cross-doc segment dedup (§2.10 ext)
  // CCNet-style paragraph-hash dedup at token granularity: disjoint
  // 8-token segments, first occurrence corpus-wide survives (smallest
  // (doc_id, pos)), docs rebuilt from kept segments. The Spark side keys
  // the first-occurrence shuffle on a 128-bit segment hash (ids+hashes
  // only — q9's content-dedup trade); the oracle groups by the segment
  // text itself, so a hash collision would surface as a mismatch.
  private val q88W = 8

  private def q88SegmentDedup(s: SparkSession, d: String): DataFrame =
    Dedup.dedupSegments(Tables.documents(s, d), col("doc_id"), col("text"),
      w = q88W)

  private val q88Sql = {
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
       |kept AS (
       |  SELECT doc_id, pos, seg FROM (
       |    SELECT doc_id, pos, seg, row_number() OVER (
       |        PARTITION BY seg ORDER BY doc_id, pos) AS rn
       |    FROM segs) WHERE rn = 1),
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

  // ----------------------------- streaming segment dedup (§2.10 ext)
  // q88's incremental counterpart: three doc_id-monotone micro-batches
  // through SegDedupStream must reproduce the batch operator exactly, so
  // the oracle IS q88's SQL (the q57/q19 equivalence pattern).
  private def q91StreamingSegDedup(s: SparkSession, d: String): DataFrame = {
    val dirFile = java.nio.file.Files.createTempDirectory("segdedup_stream")
      .toFile
    // the returned plan READS the sink files, so the dir can't be deleted
    // here — register it for the JVM-exit sweep instead (Bench's 3+ reps
    // would otherwise orphan one state+sink dir per rep past process exit)
    graft.operators.CacheHygiene.registerForCleanup(dirFile)
    val dir = dirFile.getAbsolutePath
    val docs = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text"))
    // batch bounds from the ACTUAL id range (min may be negative or
    // nonzero; assuming ids >= 0 would silently starve batch 1)
    val mm = docs.agg(min(col("id")), max(col("id"))).collect()(0)
    val lo = mm.getLong(0)
    val span = mm.getLong(1) - lo + 1
    val bounds = Seq(lo, lo + span / 3, lo + 2 * span / 3, Long.MaxValue)
    (0 until 3).foreach { b =>
      graft.streaming.SegDedupStream.ingestBatch(s,
        docs.filter(col("id") >= bounds(b) && col("id") < bounds(b + 1)),
        s"$dir/state", s"$dir/sink", w = q88W)
    }
    s.read.parquet(s"$dir/sink")
      .select(col("doc_id"), col("n_segments"), col("n_kept"), col("text"))
  }

  // Streaming semantic dedup: the embeddings table in 3 arrival batches
  // with non-decreasing vec_id ranges — the accumulated decision sink
  // through SemDedupStream must reproduce the batch operator exactly, so
  // the oracle IS q89's SQL (the q91/q57 equivalence pattern).
  private def q92StreamingSemDedup(s: SparkSession, d: String): DataFrame = {
    val dirFile = java.nio.file.Files.createTempDirectory("semdedup_stream")
      .toFile
    // the returned plan READS the sink files — JVM-exit cleanup, like q91
    graft.operators.CacheHygiene.registerForCleanup(dirFile)
    val dir = dirFile.getAbsolutePath
    val embs = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val mm = embs.agg(min(col("id")), max(col("id"))).collect()(0)
    val lo = mm.getLong(0)
    val span = mm.getLong(1) - lo + 1
    val bounds = Seq(lo, lo + span / 3, lo + 2 * span / 3, Long.MaxValue)
    (0 until 3).foreach { b =>
      graft.streaming.SemDedupStream.ingestBatch(s,
        embs.filter(col("id") >= bounds(b) && col("id") < bounds(b + 1)),
        s"$dir/state", s"$dir/sink",
        dim = 64, bits = 4, seed = 7L, threshold = 0.4)
    }
    s.read.parquet(s"$dir/sink").select(col("vec_id"), col("kept"))
  }

  // ----------------------------- semantic dedup (§2.10 ext)
  // SemDeDup decision with LSH buckets as the clustering: drop a vector
  // when a smaller-id bucket-mate has cosine >= threshold. Same planes/
  // threshold as q23, so the oracle replays the exact bucketing and the
  // NOT EXISTS mirrors the drop rule — full semantics, no recall proxy.
  private def q89SemanticDedup(s: SparkSession, d: String): DataFrame =
    Similarity.semanticDedup(Tables.embeddings(s, d), col("vec_id"),
      col("embedding"), dim = 64, bits = 4, seed = 7L, threshold = 0.4)

  private val q89Sql = {
    val bucket = sqlBucket("v", VectorExprs.lshPlanes(64, 4, 7L))
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucket AS bucket,
       |             list_inner_product(v, v) AS n2 FROM e)
       |SELECT x.vec_id, NOT EXISTS (
       |    SELECT 1 FROM b y
       |    WHERE y.bucket = x.bucket AND y.vec_id < x.vec_id
       |      AND list_inner_product(x.v, y.v) / (sqrt(x.n2) * sqrt(y.n2))
       |            >= 0.4) AS kept
       |FROM b x""".stripMargin
  }

  // ----------------------------- trigram LM scoring (§2.10 ext)
  // q72's fluency signal with one more token of context and add-k
  // (Lidstone) smoothing: P(w3|w1,w2) = (c3 + k) / (c2 + k*V). The
  // oracle replays the exact formula including the corpus vocab size V.
  private def q90TrigramNll(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.trigramNll(
      Tables.documents(s, d), col("doc_id"), col("text"), addK = 0.5)
      .withColumnRenamed("id", "doc_id")

  private val q90Sql =
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
  private def q98StupidBackoff(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.stupidBackoffNll(
      Tables.documents(s, d), col("doc_id"), col("text"),
      alpha = 0.4, heldMod = 5)
      .withColumnRenamed("id", "doc_id")

  private val q98Sql = {
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

  // ----------------------------- SQ8 scalar quantization (§2.10 embeddings)
  // Int8 scalar quantization: per-row max-abs scale, one signed byte per
  // dimension, reconstruction-free approximate dot product. Both engines
  // round half-away-from-zero and run the same IEEE op sequence, so the
  // codes and scores are bit-identical — the oracle replays the whole
  // encode + rank, no recall proxy.
  private def q99Sq8TopK(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    graft.operators.Quantize.sq8TopK(embs,
      embs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
  }

  private val q99Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx
       |      FROM e),
       |c AS (SELECT vec_id, v,
       |        CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS s FROM m),
       |codes AS (SELECT vec_id, s,
       |        CAST(list_transform(v, x -> CAST(round(x / s) AS INTEGER))
       |             AS DOUBLE[]) AS cd
       |      FROM c),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |sc AS (SELECT q.query_id, k.vec_id AS neighbor_id,
       |         k.s * list_inner_product(k.cd, q.qv) AS score
       |       FROM codes k CROSS JOIN qs q WHERE q.query_id <> k.vec_id)
       |SELECT query_id, rank, neighbor_id, round(score, 4) AS score
       |FROM (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY score DESC, neighbor_id)
       |      AS INTEGER) AS rank FROM sc) WHERE rank <= 3""".stripMargin

  // ----------------------------- SQ8 × IVF (§2.10 embeddings)
  // q99's int8 scoring over q93's scan shape: codes carry a coarse
  // list_id, queries probe only their nProbe nearest lists. The oracle
  // replays the coarse assignment, the probe ranking, and the int8
  // scoring — all literal-plane, no recall proxy.
  private def q100Sq8Ivf(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val coarse = graft.operators.Quantize.seedCodebook(embs, col("vec_id"),
      col("embedding"), ivfCoarseIds)
    graft.operators.Quantize.sq8IvfTopK(embs,
      embs.filter(col("vec_id") < 5), "vec_id", "embedding",
      coarse, ivfNProbe, k = 3)
  }

  private val q100Sql = {
    def fullDist(lhs: String, alias: String): String = {
      val diff = s"[$lhs[i] - $alias.cv[i] for i in range(1, $pqDim + 1)]"
      s"list_inner_product($diff, $diff)"
    }
    val ccCtes = ivfCoarseIds.zipWithIndex.map { case (cid, l) =>
      s"cc$l AS (SELECT v AS cv FROM e WHERE vec_id = $cid)"
    }.mkString(",\n")
    val assignMin = "list_min([" + ivfCoarseIds.indices.map(l =>
      s"[${fullDist("e.v", s"cc$l")}, $l.0]").mkString(", ") + "])"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$ccCtes,
       |ccu AS (${ivfCoarseIds.indices.map(l => s"SELECT $l AS list, cv FROM cc$l").mkString(" UNION ALL ")}),
       |mm AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx
       |       FROM e),
       |sc8 AS (SELECT vec_id, v,
       |         CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS s FROM mm),
       |codes AS (SELECT vec_id, s,
       |        CAST(list_transform(v, x -> CAST(round(x / s) AS INTEGER))
       |             AS DOUBLE[]) AS cd
       |      FROM sc8),
       |assign AS (
       |  SELECT e.vec_id, CAST($assignMin[2] AS INTEGER) AS list_id
       |  FROM e${ivfCoarseIds.indices.map(l => s" CROSS JOIN cc$l").mkString}),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |pr AS (
       |  SELECT query_id, list FROM (
       |    SELECT q.query_id, c.list, row_number() OVER (
       |      PARTITION BY q.query_id
       |      ORDER BY ${fullDist("q.qv", "c")}, c.list) AS rn
       |    FROM qs q CROSS JOIN ccu c)
       |  WHERE rn <= $ivfNProbe),
       |sc AS (
       |  SELECT q.query_id, k.vec_id AS neighbor_id,
       |    k.s * list_inner_product(k.cd, q.qv) AS score
       |  FROM codes k
       |  JOIN assign a ON a.vec_id = k.vec_id
       |  JOIN pr ON pr.list = a.list_id
       |  JOIN qs q ON q.query_id = pr.query_id
       |  WHERE q.query_id <> k.vec_id)
       |SELECT query_id, rank, neighbor_id, round(score, 4) AS score
       |FROM (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY score DESC, neighbor_id)
       |      AS INTEGER) AS rank FROM sc) WHERE rank <= 3""".stripMargin
  }

  // ----------------------------- Gopher quality rules (§2.10 text)
  // Rae et al. 2021 Appendix A rule filter: per-rule boolean flags plus
  // the keep conjunction, every threshold in integer arithmetic so the
  // oracle replays the decisions bit-exactly. Map-side only.
  private def q101GopherRules(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextExprs.gopherFlags(col("text")).as("g"))
      .select(col("doc_id"), col("g.n_tok").as("n_tok"),
        col("g.r_len").as("r_len"), col("g.r_wordlen").as("r_wordlen"),
        col("g.r_alpha").as("r_alpha"), col("g.r_stop").as("r_stop"),
        col("g.r_distinct").as("r_distinct"), col("g.keep").as("keep"))

  private val q101Sql = {
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

  // ----------------------------- CCNet perplexity buckets (§2.10 ext)
  // Wenzek et al. 2020: score every doc with the corpus LM (q90's add-k
  // trigram NLL), cut the corpus into head/middle/tail at the NLL
  // terciles, assign map-side. The tercile boundaries come from the
  // k-bounded quantile sketch (q67's portable-hash sample — NEVER a
  // global sort/window over the corpus), broadcast as one row; the oracle
  // replays LM, sample, rank-picks, and the bucket CASE end-to-end.
  private def q102CcnetBuckets(s: SparkSession, d: String): DataFrame = {
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

  private val q102Sql = {
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

  // ----------------------------- streaming LM counts (§2.10 streaming)
  // q98's count tables accumulated across 3 micro-batches of the train
  // split, then scored from state. Raw n-gram counts are additive, so the
  // accumulated tables equal the batch tables EXACTLY for any split — the
  // oracle is q98's SQL verbatim (the q96/q97 oracle-reuse precedent).
  private def q103StreamingLmCounts(s: SparkSession, d: String): DataFrame = {
    val dirFile = java.nio.file.Files.createTempDirectory("q103lm").toFile
    graft.operators.CacheHygiene.registerForCleanup(dirFile)
    val dir = dirFile.getAbsolutePath
    val docs = Tables.documents(s, d)
    val train = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val mm = train.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    val lo = mm.getLong(0)
    val span = mm.getLong(1) - lo + 1
    val bounds = Seq(lo, lo + span / 3, lo + 2 * span / 3, Long.MaxValue)
    (0 until 3).foreach { b =>
      graft.streaming.NgramLmStream.ingestBatch(s,
        train.filter(col("doc_id") >= bounds(b) &&
          col("doc_id") < bounds(b + 1)),
        col("doc_id"), col("text"), s"$dir/state")
    }
    graft.streaming.NgramLmStream.scoreFromState(s, s"$dir/state",
        docs.filter(pmod(col("doc_id"), lit(5)) === 0),
        col("doc_id"), col("text"), alpha = 0.4)
      .withColumnRenamed("id", "doc_id")
  }

  // ----------------------------- binary quantization ANN (§2.10 embeddings)
  // 1-bit/dim sign quantization — the coarsest point of the PQ→SQ8→BQ
  // ladder: Hamming scan over packed sign words picks `rerank` candidates
  // per query, exact float cosine re-scores only those. Sign tests and
  // popcounts are integer-exact and the rerank is q21's IEEE sequence, so
  // the oracle replays the REAL two-pass semantics (the candidate cut
  // included), not a recall proxy; the oracle computes Hamming as the
  // count of sign-disagreeing dimensions — mathematically identical to
  // the packed-word popcount without bit arithmetic.
  private val q104Rerank = 10

  private def q104BqTopK(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    graft.operators.Quantize.bqTopK(embs, embs.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim = pqDim, k = 3, rerank = q104Rerank)
  }

  private val q104Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |ham AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id, c.v AS cv, q.qv,
       |    len(list_filter(range(1, ${pqDim + 1}),
       |        i -> (c.v[i] > 0) <> (q.qv[i] > 0))) AS hamming
       |  FROM e c CROSS JOIN qs q WHERE c.vec_id <> q.query_id),
       |cand AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY hamming, neighbor_id) AS hrank
       |    FROM ham) WHERE hrank <= $q104Rerank),
       |sc AS (
       |  SELECT query_id, neighbor_id, hamming,
       |    list_inner_product(qv, cv) /
       |      (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS c
       |  FROM cand)
       |SELECT query_id, rank, neighbor_id, CAST(hamming AS BIGINT) AS hamming,
       |  round(c, 4) AS cos
       |FROM (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank
       |      FROM sc) WHERE rank <= 3""".stripMargin

  // ----------------------------- boilerplate segment drop (§2.10 ext)
  // RefinedWeb's line-dedup rule at q88's token-segment granularity: a
  // segment occurring in ≥ 2 DISTINCT documents is boilerplate and is
  // dropped from EVERY doc (no survivor — the opposite keep rule to
  // q88's first-occurrence). The oracle groups by segment text itself,
  // so a 128-bit hash collision on the Spark side would surface.
  private def q105BoilerplateSegments(s: SparkSession, d: String): DataFrame =
    Dedup.dropFrequentSegments(Tables.documents(s, d), col("doc_id"),
      col("text"), w = q88W, minDf = 2)

  private val q105Sql = {
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

  // ----------------------------- duplicated-span removal (§2.10 ext)
  // q66's measurement turned into Lee et al.'s cleanup: every duplicated
  // k-gram keeps its corpus-first occurrence, positions under non-first
  // occurrences are cut, docs rebuilt from the survivors. The oracle
  // replays first-pick (row_number over gram text), coverage union, and
  // rebuild end-to-end.
  private def q106DupSpanRemoval(s: SparkSession, d: String): DataFrame =
    Dedup.removeDupSpans(Tables.documents(s, d), col("doc_id"), col("text"),
      k = q66K)

  private val q106Sql = {
    val k = q66K
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |b AS (SELECT doc_id, len(ts) AS n_tokens, ts FROM toks),
       |g AS (
       |  SELECT doc_id, i - 1 AS pos, array_to_string(ts[i:i+${k - 1}], ' ') AS gram
       |  FROM b, UNNEST(range(1, n_tokens - ${k - 2})) AS u(i)
       |  WHERE n_tokens >= $k),
       |occ AS (
       |  SELECT doc_id, pos,
       |    count(*) OVER (PARTITION BY gram) AS n_occ,
       |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
       |  FROM g),
       |nf AS (SELECT doc_id, pos FROM occ WHERE n_occ >= 2 AND rn > 1),
       |cov AS (
       |  SELECT doc_id, list_distinct(flatten(
       |    list(range(pos, pos + $k) ORDER BY pos))) AS cv
       |  FROM nf GROUP BY doc_id),
       |keep AS (
       |  SELECT b.doc_id, b.n_tokens, b.ts,
       |    list_filter(range(0, b.n_tokens),
       |      i -> NOT list_contains(coalesce(c.cv, []), i)) AS kp
       |  FROM b LEFT JOIN cov c USING (doc_id))
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_tokens - len(kp) AS BIGINT) AS n_removed,
       |  coalesce(array_to_string(list_transform(kp, i -> ts[i + 1]), ' '),
       |           '') AS text
       |FROM keep""".stripMargin
  }

  // ----------------------------- random-projection ANN (§2.10 embeddings)
  // Johnson–Lindenstrauss dimensionality reduction as the candidate
  // stage of a two-pass top-k: approximate cosine in the 16-dim
  // projected space picks `rerank` candidates, exact 64-dim cosine
  // re-scores only those. The matrix is a driver-side literal (q22's
  // plane discipline), so the oracle replays projection, candidate cut,
  // and rerank end-to-end.
  private val q107DimOut = 16
  private lazy val q107Matrix =
    Similarity.rpMatrix(pqDim, q107DimOut, seed = 107L)

  private def q107RpTopK(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    Similarity.rpTopK(embs, embs.filter(col("vec_id") < 5),
      "vec_id", "embedding", q107Matrix, k = 3, rerank = q104Rerank)
  }

  private val q107Sql = {
    val proj = q107Matrix.map(row =>
      "list_inner_product(v, [" + row.map(_.toString).mkString(", ") + "])")
      .mkString("[", ",\n      ", "]")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |p AS (SELECT vec_id, v, $proj AS pv FROM e),
       |qs AS (SELECT vec_id AS query_id, v AS qv, pv AS pq FROM p WHERE vec_id < 5),
       |ap AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id, c.v AS cv, q.qv,
       |    list_inner_product(q.pq, c.pv) /
       |      (sqrt(list_inner_product(q.pq, q.pq)) * sqrt(list_inner_product(c.pv, c.pv))) AS ac
       |  FROM p c CROSS JOIN qs q WHERE c.vec_id <> q.query_id),
       |cand AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY ac DESC, neighbor_id) AS arank
       |    FROM ap) WHERE arank <= $q104Rerank),
       |sc AS (
       |  SELECT query_id, neighbor_id, ac,
       |    list_inner_product(qv, cv) /
       |      (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS c
       |  FROM cand)
       |SELECT query_id, rank, neighbor_id, round(ac, 4) AS approx_cos,
       |  round(c, 4) AS cos
       |FROM (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank
       |      FROM sc) WHERE rank <= 3""".stripMargin
  }

  // ----------------------------- fuzzy decontamination (§2.10 ext)
  // Document-level near-dup matching vs the benchmark split (doc_id % 7
  // = 0): MinHash-LSH band collisions generate corpus×benchmark
  // candidates, exact cross-set shingle Jaccard ≥ 0.8 confirms. At 16×2
  // bands recall on ≥0.8 pairs is ≈ 1 (q19's argument), so the output
  // EQUALS the exact cross-set computation — which is the oracle.
  private val q108BenchMod = 7L

  private def q108FuzzyDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Contamination.fuzzyVsBenchmark(
      corpus = docs.filter(col("doc_id") % q108BenchMod =!= 0),
      benchmark = docs.filter(col("doc_id") % q108BenchMod === 0),
      col("doc_id"), col("text"),
      n = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)
  }

  private val q108Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
       |  )) AS shingle FROM toks WHERE len(ts) > 0),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS cid, b.doc_id AS bid, count(*) AS n_inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle
       |  WHERE a.doc_id % $q108BenchMod <> 0 AND b.doc_id % $q108BenchMod = 0
       |  GROUP BY 1, 2),
       |jp AS (
       |  SELECT cid, bid,
       |    CAST(n_inter AS DOUBLE) /
       |      CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS j
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = cid
       |  JOIN sizes sb ON sb.doc_id = bid)
       |SELECT cid AS doc_id, count(*) AS n_bench_hits,
       |  round(max(j), 6) AS max_jaccard
       |FROM jp WHERE j >= 0.8 GROUP BY cid""".stripMargin

  // ----------------------------- n-gram diversity metrics (§2.10 ext)
  // Corpus-datasheet repetitiveness signal: per source and per n ∈
  // {1,2,3}, total n-gram occurrences, distinct n-grams, and their
  // ratio (type-token ratio at n=1). The Spark side shuffles only
  // (group, hash128) — the oracle groups by the gram string itself.
  private def q109NgramDiversity(s: SparkSession, d: String): DataFrame =
    graft.operators.Diversity.ngramDiversity(Tables.documents(s, d),
      col("text"), col("source"), Seq(1, 2, 3))

  private val q109Sql = {
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

  // ----------------------------- DSIR importance weights (§2.10 ext)
  // Data Selection via Importance Resampling (Xie et al. 2023): raw-pool
  // docs scored by hashed-n-gram likelihood ratio vs the target domain
  // (source = 'src0'), unigram+bigram features into 1024 buckets, add-1
  // smoothing. Bucket hash = the oracle-portable poly fold (q87's replay
  // discipline); ln-sum rounding(4) follows the LM-oracle precedent.
  private val q110Buckets = 1024

  private def q110DsirWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Dsir.importanceWeights(
      raw = docs.filter(col("source") =!= "src0"),
      target = docs.filter(col("source") === "src0"),
      col("doc_id"), col("text"), buckets = q110Buckets)
  }

  private val q110Sql = {
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

  // ----------------------------- Kneser–Ney bigram LM (§2.10 ext)
  // Interpolated KN with one absolute discount D=0.75: the
  // standard-smoothing rung above stupid backoff — continuation counts
  // (distinct contexts) instead of raw frequency in the backoff term.
  private def q111KnNll(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.kneserNeyNll(
      Tables.documents(s, d), col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")

  private val q111Sql =
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

  // ----------------------------- shingle containment (§2.10 ext)
  // Directed |A∩B|/|A| — the asymmetric quote/excerpt relation Jaccard
  // misses; same posting-list plan as q18, both directions emitted.
  private val q112Threshold = 0.5

  private def q112Containment(s: SparkSession, d: String): DataFrame =
    graft.operators.NearDup.containmentPairs(Tables.documents(s, d),
      col("doc_id"), col("text"), n = 3, threshold = q112Threshold)

  private val q112Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
       |  )) AS shingle FROM toks WHERE len(ts) > 0),
       |sh AS (
       |  SELECT doc_id, shingle FROM (
       |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
       |    FROM sh0) WHERE df <= 1000),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_sub, b.doc_id AS id_sup, count(*) AS n_inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT id_sub, id_sup, n_inter, sa.n_sh AS n_sub, sb.n_sh AS n_sup,
       |  round(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE), 6)
       |    AS containment
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = id_sub
       |JOIN sizes sb ON sb.doc_id = id_sup
       |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE)
       |  >= $q112Threshold""".stripMargin

  // ----------------------------- character entropy (§2.10 ext)
  // Shannon entropy of the per-doc character distribution — the
  // gibberish/base64/padding gate. Spark computes it map-side (sorted
  // distinct-char fold); the oracle replays it relationally. round(4)
  // absorbs the sum-order float delta; `0 -` keeps +0.0 (not -0.0) on
  // single-distinct-char docs so the normalized hash agrees.
  private def q113CharEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      graft.functions.TextExprs.charEntropy(col("text")).as("char_entropy"))

  private val q113Sql =
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

  // ----------------------------- hard-negative mining (§2.10 ext)
  // Contrastive-training negatives: per query, top-k most-similar
  // DIFFERENT-label embeddings under the false-negative cosine guard.
  private val q114MaxCos = 0.995

  private def q114HardNegatives(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    graft.operators.Similarity.hardNegatives(embs,
      embs.filter(col("vec_id") < 8), "vec_id", "embedding", "label",
      k = 5, maxCos = q114MaxCos)
  }

  private val q114Sql =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
       |      FROM e WHERE vec_id < 8),
       |s AS (
       |  SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id,
       |    e.label AS neighbor_label,
       |    list_inner_product(q.qv, e.v) /
       |      (sqrt(list_inner_product(q.qv, q.qv)) *
       |       sqrt(list_inner_product(e.v, e.v))) AS c
       |  FROM e CROSS JOIN q WHERE q.query_label <> e.label)
       |SELECT query_id, query_label, rank, neighbor_id, neighbor_label,
       |  round(c, 4) AS cos
       |FROM (SELECT *, CAST(row_number() OVER (
       |        PARTITION BY query_id ORDER BY c DESC, neighbor_id)
       |      AS INTEGER) AS rank
       |      FROM s WHERE c <= $q114MaxCos) WHERE rank <= 5""".stripMargin

  // ----------------------------- per-source document cap (§2.10 ext)
  // RefinedWeb-style per-domain cap: best-quality `n` docs survive per
  // source. Empty docs excluded on both sides (q30 parity).
  private val q115Cap = 10

  private def q115SourceCap(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
    graft.operators.Mix.capPerGroup(docs, col("doc_id"), col("source"),
      graft.functions.TextExprs.qualityScore(col("text")), n = q115Cap)
  }

  private val q115Sql =
    s"""WITH sc AS (
       |  SELECT source AS grp, doc_id AS id,
       |    $qualitySqlBody AS q
       |  FROM documents WHERE length(trim(text)) > 0)
       |SELECT grp, rank, id, round(q, 4) AS quality
       |FROM (SELECT grp, id, q, CAST(row_number() OVER (
       |        PARTITION BY grp ORDER BY q DESC, id) AS INTEGER) AS rank
       |      FROM sc) WHERE rank <= $q115Cap""".stripMargin

  // ----------------------------- length histogram datasheet (§2.10 ext)
  // Power-of-two token-count buckets per source; bucket = len(bin(n)) —
  // integer/string arithmetic, no float log2. All-integer outputs.
  private def q116LengthHistogram(s: SparkSession, d: String): DataFrame =
    graft.operators.Diversity.lengthHistogram(Tables.documents(s, d),
      col("text"), col("source"))

  private val q116Sql =
    """WITH toks AS (
      |  SELECT source, CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
      |  FROM documents)
      |SELECT source AS grp,
      |  CAST(CASE WHEN n_tok = 0 THEN 0 ELSE length(bin(n_tok)) END
      |    AS INTEGER) AS bucket,
      |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  min(n_tok) AS min_tok, max(n_tok) AS max_tok
      |FROM toks GROUP BY 1, 2""".stripMargin

  // ----------------------------- random-rotation PQ (§2.10 ext)
  // OPQ-lite: rotate by a deterministic orthogonal matrix (plan
  // literals), then q50's seed-row PQ in the ROTATED space. Rotation
  // preserves distances, so this is the training-free subspace-balancing
  // rung below learned OPQ; the oracle rebuilds the rotated table from
  // the same literal matrix and replays the q50 assignment.
  private lazy val q117Rotation =
    Similarity.orthogonalMatrix(pqDim, seed = 117L)

  private def q117RotationPq(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val rot = embs.select(col("vec_id"),
      Similarity.rpProject(col("embedding").cast("array<double>"),
        q117Rotation).as("rvec"))
    val cb = graft.operators.Quantize.seedCodebook(rot, col("vec_id"),
      col("rvec"), pqSeedIds)
    graft.operators.Quantize.pqEncode(rot, col("vec_id"), col("rvec"),
        cb, pqM, pqDim)
      .withColumnRenamed("id", "vec_id")
  }

  private val q117Sql = {
    val proj = q117Rotation.map(row =>
      "list_inner_product(v0, [" + row.map(_.toString).mkString(", ") + "])")
      .mkString("[", ",\n      ", "]")
    val mins = (0 until pqM).map { j =>
      "list_min([" + pqSeedIds.indices.map(c =>
        s"[${pqDistSql(j, s"cb$c")}, $c.0]").mkString(", ") + s"]) AS m$j"
    }.mkString(",\n    ")
    val codes = (0 until pqM).map(j => s"CAST(m$j[2] AS INTEGER) AS c$j")
      .mkString(", ")
    val mse = (0 until pqM).map(j => s"m$j[1]").mkString(" + ")
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0
       |            FROM embeddings),
       |e AS (SELECT vec_id, $proj AS v FROM e0),
       |$pqCbCtes,
       |p AS (
       |  SELECT e.vec_id,
       |    $mins
       |  FROM e${pqSeedIds.indices.map(c => s" CROSS JOIN cb$c").mkString})
       |SELECT vec_id, $codes, round($mse, 6) AS distortion FROM p""".stripMargin
  }

  // ----------------------------- tokenizer fertility datasheet (§2.10 ext)
  // Chars-per-pretoken and pretokens-per-word per source: how a BPE-ish
  // vocabulary segments each slice (high fertility = the tokenizer
  // fragments that source; the datasheet panel behind per-language token
  // budgeting). Integer sums + two rounded ratios.
  private def q118Fertility(s: SparkSession, d: String): DataFrame = {
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

  private val q118Sql = {
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

  // ----------------------------- phrase blocklist (§2.10 ext)
  // Whole-word-sequence phrase matching (C4 bad-words shape): broadcast
  // phrase table, one tokenize per doc, only matched grams shuffle.
  private val q119Phrases =
    Seq("slow query", "big table", "merge batch", "vector", "the group line")

  private def q119Blocklist(s: SparkSession, d: String): DataFrame =
    graft.operators.Blocklist.phraseHits(Tables.documents(s, d),
      col("doc_id"), col("text"), q119Phrases)
      .withColumnRenamed("id", "doc_id")

  private val q119Sql = {
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

  // ----------------------------- cross-source overlap matrix (§2.10 ext)
  // Inter-source contamination panel: distinct 3-gram overlap
  // coefficient (shared / min) per source pair.
  private def q120SourceOverlap(s: SparkSession, d: String): DataFrame =
    graft.operators.Contamination.sourceOverlapMatrix(
      Tables.documents(s, d), col("source"), col("text"), n = 3)

  private val q120Sql =
    """WITH toks AS (
      |  SELECT source, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |       ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
      |  FROM documents),
      |sg AS (
      |  SELECT DISTINCT source AS src, g FROM (
      |    SELECT source, unnest(list_distinct(
      |      [array_to_string(ts[i:i+2], ' ')
      |       for i in range(1, greatest(len(ts)-3, 0) + 2)])) AS g
      |    FROM toks WHERE len(ts) > 0)),
      |sizes AS (SELECT src, count(*) AS n_grams FROM sg GROUP BY src),
      |pairs AS (
      |  SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
      |  FROM sg a JOIN sg b ON a.g = b.g AND a.src < b.src GROUP BY 1, 2)
      |SELECT src_a, src_b, n_shared, sa.n_grams AS n_a, sb.n_grams AS n_b,
      |  round(CAST(n_shared AS DOUBLE) /
      |        CAST(least(sa.n_grams, sb.n_grams) AS DOUBLE), 6) AS overlap
      |FROM pairs
      |JOIN sizes sa ON sa.src = src_a
      |JOIN sizes sb ON sb.src = src_b""".stripMargin

  // ----------------------------- winnowing fingerprints (§2.10 ext)
  // MOSS winnowing (k=3 grams, window w=4): deterministic detection of
  // shared runs >= w+k-1 tokens at ~2/(w+1) of the exact posting volume.
  private val (q121K, q121W) = (3, 4)

  private def q121Winnowing(s: SparkSession, d: String): DataFrame =
    graft.operators.NearDup.winnowingPairs(Tables.documents(s, d),
      col("doc_id"), col("text"), k = q121K, w = q121W, minShared = 1)

  private val q121Sql = {
    val (k, w) = (q121K, q121W)
    val poly = "list_reduce(list_transform(string_split(g, ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |gh AS (
       |  SELECT doc_id,
       |    [$poly for g in
       |      [array_to_string(ts[i:i+${k - 1}], ' ')
       |       for i in range(1, len(ts) - ${k - 2})]] AS gh
       |  FROM toks WHERE len(ts) >= $k),
       |fp0 AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [list_min(gh[j:j+${w - 1}])
       |     for j in range(1, greatest(len(gh) - ${w - 1}, 1) + 1)])) AS fp
       |  FROM gh),
       |fp AS (
       |  SELECT doc_id, fp FROM (
       |    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
       |    FROM fp0) WHERE df <= 1000),
       |sizes AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, n_shared, sa.n_fp AS n_a, sb.n_fp AS n_b,
       |  round(CAST(n_shared AS DOUBLE) /
       |        CAST(least(sa.n_fp, sb.n_fp) AS DOUBLE), 6) AS sim
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = id_a
       |JOIN sizes sb ON sb.doc_id = id_b""".stripMargin
  }

  // ----------------------------- sketch overlap matrix (§2.10 ext)
  // q120's matrix at KMV-sketch cost: per-pair Jaccard/overlap estimates
  // from merged bottom-k sketches (Beyer et al. 2007); exact when a
  // pair's universe fits in k.
  private val q122K = 256

  private def q122OverlapSketch(s: SparkSession, d: String): DataFrame =
    graft.operators.Contamination.sourceOverlapMatrixSketch(
      Tables.documents(s, d), col("source"), col("text"), n = 3, k = q122K)

  private val q122Sql = {
    val k = q122K
    val poly = "list_reduce(list_transform(string_split(g, ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val h = s"((($poly * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    val estU = s"CASE WHEN n_union < $k THEN CAST(n_union AS DOUBLE) " +
      s"ELSE ${k - 1}.0 * 1000000007.0 / CAST(kth_u AS DOUBLE) END"
    s"""WITH toks AS (
       |  SELECT source, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |       ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT source AS src, g FROM (
       |    SELECT source, unnest(list_distinct(
       |      [array_to_string(ts[i:i+2], ' ')
       |       for i in range(1, greatest(len(ts)-3, 0) + 2)])) AS g
       |    FROM toks WHERE len(ts) > 0)),
       |hs AS (SELECT DISTINCT src, $h AS h FROM sh),
       |sk AS (SELECT src, h FROM (
       |    SELECT src, h, row_number() OVER (PARTITION BY src ORDER BY h) AS r
       |    FROM hs) WHERE r <= $k),
       |per AS (SELECT src, count(*) AS n_x, max(h) AS kth FROM sk GROUP BY src),
       |ests AS (SELECT src, CASE WHEN n_x < $k THEN CAST(n_x AS DOUBLE)
       |    ELSE ${k - 1}.0 * 1000000007.0 / CAST(kth AS DOUBLE) END AS est
       |  FROM per),
       |prs AS (SELECT a.src AS src_a, a.est AS est_a,
       |               b.src AS src_b, b.est AS est_b
       |        FROM ests a JOIN ests b ON a.src < b.src),
       |u0 AS (
       |  SELECT p.src_a, p.src_b, s.h,
       |    bool_or(s.src = p.src_a) AS in_a, bool_or(s.src = p.src_b) AS in_b
       |  FROM prs p JOIN sk s ON s.src = p.src_a OR s.src = p.src_b
       |  GROUP BY 1, 2, 3),
       |u AS (SELECT * FROM (
       |    SELECT src_a, src_b, h, in_a, in_b,
       |      row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS r
       |    FROM u0) WHERE r <= $k),
       |agg AS (
       |  SELECT src_a, src_b, count(*) AS n_union, max(h) AS kth_u,
       |    sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS n_common
       |  FROM u GROUP BY 1, 2)
       |SELECT a.src_a, a.src_b, CAST(n_common AS BIGINT) AS n_common,
       |  n_union,
       |  round(CAST(n_common AS DOUBLE) / n_union, 6) AS j_est,
       |  round(est_a, 4) AS est_a, round(est_b, 4) AS est_b,
       |  round(CAST(n_common AS DOUBLE) / n_union * ($estU) /
       |        least(est_a, est_b), 6) AS overlap_est
       |FROM agg a JOIN prs p ON a.src_a = p.src_a AND a.src_b = p.src_b""".stripMargin
  }

  // ----------------------------- per-source quality buckets (§2.10 ext)
  // The q102 (CCNet buckets) composition PER SOURCE: within-source
  // quality terciles from the k-bounded group quantile sketch — no
  // per-source sort of the corpus, boundaries broadcast back. Quality is
  // rounded(6) BEFORE sketching so boundary comparisons are
  // engine-identical.
  private def q123SourceQualityBuckets(s: SparkSession, d: String): DataFrame = {
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

  private val q123Sql = {
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

  // ----------------------------- hybrid retrieval, RRF fusion (§2.10 ext)
  // Lexical (BM25 over documents.text) and semantic (cosine over the
  // doc's embedding row — vec_id ≡ doc_id for embedded docs) arms at
  // depth 20, fused per query by reciprocal-rank fusion in exact 1e12
  // fixed-point (`Retrieval.rrfFuse`). The three text queries pair with
  // query vectors 0/1/2; docs present in only one arm contribute that
  // arm's term alone — the standard RRF treatment of unranked docs.
  private val q124Arms = Seq(("narrow", 0L), ("mixed", 1L), ("stop", 2L))
  private val q124Depth = 20
  private val q124C = 60
  private val q124TopK = 10

  private def q124HybridRrf(s: SparkSession, d: String): DataFrame = {
    val bm = graft.operators.Bm25.topK(Tables.documents(s, d),
      col("doc_id"), col("text"), q68Queries, q68K1, q68B, q124Depth)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val embs = Tables.embeddings(s, d)
    val qvecs = embs.filter(col("vec_id").isin(q124Arms.map(_._2): _*))
    val nameOf = q124Arms.tail.foldLeft(
      when(col("query_id") === lit(q124Arms.head._2), lit(q124Arms.head._1))) {
      case (acc, (name, vid)) => acc.when(col("query_id") === lit(vid), lit(name))
    }
    val co = graft.operators.Similarity
      .bruteForceTopK(embs, qvecs, "vec_id", "embedding", q124Depth)
      .select(nameOf.as("query_id"), col("rank"),
        col("neighbor_id").as("doc_id"))
    graft.operators.Retrieval.rrfFuse(Seq(bm, co), q124C, q124TopK)
  }

  private val q124Sql = {
    val vecIds = q124Arms.map(_._2).mkString(", ")
    val caseArm = q124Arms.map { case (n, v) =>
      s"WHEN $v THEN '$n'" }.mkString(" ")
    s"""WITH bm AS (
       |  SELECT query_id, rank, doc_id
       |  FROM (${bm25SqlFor(q68Queries, q68K1, q68B, q124Depth)})),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ($vecIds)),
       |cs AS (
       |  SELECT qv.qid, e.vec_id AS doc_id,
       |    list_inner_product(qv.qv, e.v) /
       |      (sqrt(list_inner_product(qv.qv, qv.qv)) *
       |       sqrt(list_inner_product(e.v, e.v))) AS c
       |  FROM e CROSS JOIN qv WHERE qv.qid <> e.vec_id),
       |co AS (
       |  SELECT CASE qid $caseArm END AS query_id, rank, doc_id
       |  FROM (SELECT qid, doc_id, row_number() OVER (
       |          PARTITION BY qid ORDER BY c DESC, doc_id) AS rank FROM cs)
       |  WHERE rank <= $q124Depth),
       |u AS (
       |  SELECT query_id, doc_id, 1000000000000 // ($q124C + rank) AS contrib
       |  FROM bm
       |  UNION ALL
       |  SELECT query_id, doc_id, 1000000000000 // ($q124C + rank) FROM co),
       |f AS (SELECT query_id, doc_id, sum(contrib) AS rrf FROM u GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, rrf, row_number() OVER (
       |        PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
       |      FROM f)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
       |  CAST(rrf AS BIGINT) AS rrf_e12
       |FROM r WHERE rank <= $q124TopK""".stripMargin
  }

  // ----------------------- logistic-regression training (§2.10 ext)
  // The TRAIN step of the hashed linear filter q77 serves: full-batch
  // gradient descent on hashed token-count features, label = "is the
  // doc English" — a language/quality-filter trained on-cluster. Every
  // gradient is snapped to 1e-8 fixed-point before the cross-doc sum
  // (exact BIGINT aggregate), so the oracle replays all `q125Iters`
  // iterations bit-for-bit as unrolled CTEs: per-iteration weights are
  // SQL expressions over the previous iteration's, not copied literals.
  private val q125D = 16
  private val q125Lr = 0.5
  private val q125Iters = 3

  private def q125LogregTrain(s: SparkSession, d: String): DataFrame =
    graft.operators.Classify.trainLogReg(Tables.documents(s, d),
      col("doc_id"), col("text"), (col("lang") === "en").cast("int"),
      q125D, q125Lr, q125Iters)

  private val q125Sql = {
    def poly(v: String) = "list_reduce(list_transform(string_split(" + v +
      ", ''), c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    def wCase(alias: String) =
      s"CASE (${poly("t")}) % $q125D " +
        (0 until q125D).map(j => s"WHEN $j THEN $alias.w_$j").mkString(" ") +
        " END"
    def wRow(i: Int): String =
      if (i == 0)
        "w0 AS (SELECT CAST(0.0 AS DOUBLE) AS b, " +
          (0 until q125D).map(j => s"CAST(0.0 AS DOUBLE) AS w_$j")
            .mkString(", ") + ")"
      else {
        val g = s"g${i - 1}"
        val upd = (0 until q125D).map(j =>
          s"w.w_$j - $q125Lr * ((CAST($g.g_$j AS DOUBLE) / 100000000.0) / " +
            s"CAST(nd.n_docs AS DOUBLE)) AS w_$j").mkString(",\n        ")
        s"""w$i AS (SELECT
           |        w.b - $q125Lr * ((CAST($g.g_b AS DOUBLE) / 100000000.0) /
           |          CAST(nd.n_docs AS DOUBLE)) AS b,
           |        $upd
           |      FROM w${i - 1} w CROSS JOIN $g CROSS JOIN nd)""".stripMargin
      }
    def gRow(i: Int): String = {
      val gAggs = (0 until q125D).map(j =>
        s"sum(CASE WHEN bucket = $j THEN g ELSE 0 END) AS g_$j")
        .mkString(",\n        ")
      s"""p$i AS (SELECT ts, y, n,
         |        1.0 / (1.0 + exp(-(w.b + (list_reduce(list_transform(ts,
         |          t -> ${wCase("w")}), (za, zb) -> za + zb) /
         |          CAST(n AS DOUBLE))))) AS p
         |      FROM ft CROSS JOIN w$i w),
         |g$i AS (SELECT
         |        (SELECT sum(CAST(round((p - y) * 100000000.0) AS BIGINT))
         |         FROM p$i) AS g_b,
         |        $gAggs
         |      FROM (SELECT (${poly("tok")}) % $q125D AS bucket,
         |              CAST(round(((p - y) / CAST(n AS DOUBLE)) *
         |                100000000.0) AS BIGINT) AS g
         |            FROM (SELECT p, y, n, unnest(ts) AS tok FROM p$i)))""".stripMargin
    }
    val iterCtes = (0 until q125Iters)
      .map(i => s"${wRow(i)},\n${gRow(i)}").mkString(",\n")
    val finalW = wRow(q125Iters).stripPrefix(s"w$q125Iters AS (")
      .stripSuffix(")")
    val out = (s"SELECT -1 AS idx, round(b, 9) AS weight FROM wf" +:
      (0 until q125D).map(j =>
        s"SELECT $j AS idx, round(w_$j, 9) AS weight FROM wf"))
      .mkString("\n UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS yl
       |  FROM documents WHERE length(trim(text)) > 0),
       |ft AS (SELECT ts, CAST(yl AS DOUBLE) AS y, len(ts) AS n
       |       FROM toks WHERE len(ts) > 0),
       |nd AS (SELECT count(*) AS n_docs FROM ft),
       |$iterCtes,
       |wf AS ($finalW)
       |SELECT CAST(idx AS INTEGER) AS idx, weight FROM ($out)""".stripMargin
  }


  // ------------------- temperature-scaled mixture sampling (§2.10 ext)
  // q73's budget mixing with `p_g ∝ T_g^α` target shares (α = 0.7 — the
  // mBERT/XLM-R small-source up-weighting). The only transcendental step
  // (exp/ln pow) is per-group local with its output snapped to 6
  // decimals before the cross-group decimal sum, so every rate — and
  // therefore every row's keep decision — replays exactly.
  private val q126Alpha = 0.7
  private val q126Budget = 8000L
  private val q126Scale = 10000

  private def q126TemperatureMix(s: SparkSession, d: String): DataFrame =
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
  private def temperatureMixCtes(docsRel: String): String = {
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

  private val q126Sql = "WITH " + temperatureMixCtes("documents")

  // ----------------------------- HyperLogLog distinct (§2.10 ext)
  // Register-based distinct sibling of the KMV family (q56/q64): fixed
  // 2^p registers, max-mergeable, fully relational. The oracle replays
  // the ESTIMATE — register index/rank are integer+bin() ops on the
  // portable hash, and the harmonic denominator is an exact dyadic sum.
  private val q127P = 8

  private def q127HllDistinct(s: SparkSession, d: String): DataFrame =
    graft.operators.Sketch.hllDistinctByGroup(
      Tables.documents(s, d).select(col("source"),
        explode(TextExprs.tokens(col("text"))).as("tok")),
      col("source"), col("tok"), q127P)
      .select(col("grp").as("source"), col("regs_hit"), col("est_distinct"))

  private val q127Sql = {
    val m = 1 << q127P
    val wBits = 64 - java.lang.Long.numberOfLeadingZeros(
      (1000000007L - 1L) / m)
    val w1 = wBits + 1
    val alpha = s"CAST(${0.7213 / (1.0 + 1.079 / m)} AS DOUBLE)"
    val mD = s"CAST($m.0 AS DOUBLE)"
    val thr = s"CAST(${2.5 * m} AS DOUBLE)"
    val poly = "list_reduce(list_transform(string_split(tok, ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val mh = s"((($poly * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    s"""WITH tk AS (
       |  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents WHERE length(trim(text)) > 0),
       |h AS (SELECT source, $mh AS mh FROM tk),
       |r AS (SELECT source, mh % $m AS reg, mh // $m AS q FROM h),
       |rg AS (SELECT source, reg,
       |      max(CASE WHEN q = 0 THEN $w1 ELSE $w1 - len(bin(q)) END) AS mrho
       |    FROM r GROUP BY source, reg),
       |e AS (SELECT source, count(*) AS regs_hit,
       |      (($mD - CAST(count(*) AS DOUBLE)) +
       |        sum(pow(2.0, -CAST(mrho AS DOUBLE)))) AS den,
       |      $m - count(*) AS v
       |    FROM rg GROUP BY source)
       |SELECT source, regs_hit,
       |  round(CASE WHEN (($alpha * $mD) * $mD) / den <= $thr AND v > 0
       |        THEN $mD * ln($mD / CAST(v AS DOUBLE))
       |        ELSE (($alpha * $mD) * $mD) / den END, 4) AS est_distinct
       |FROM e""".stripMargin
  }

  // ----------------------------- MMR diverse selection (§2.10 ext)
  // Diversity-aware re-rank of a retrieval pool (Carbonell & Goldstein
  // 1998): greedy λ·rel − (1−λ)·max-sim-to-selected over the top-20
  // cosine pool, k=5 per query. Both cosine tables snap to 4 decimals
  // (the q21 parity point); the oracle replays the greedy loop as one
  // CTE pair (candidates + argmax) per selection step.
  private val q128PoolN = 20
  private val q128K = 5
  private val q128Lambda = 0.7

  private def q128MmrSelect(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    graft.operators.Diversity.mmrSelect(embs,
      embs.filter(col("vec_id") < 3), "vec_id", "embedding",
      q128PoolN, q128K, q128Lambda)
  }

  private val q128Sql = {
    val l = q128Lambda.toString
    val om = (1.0 - q128Lambda).toString
    val mmrExpr = s"CAST($l AS DOUBLE) * rel - CAST($om AS DOUBLE) * coalesce(pen, 0.0)"
    def step(i: Int): String = {
      val prev = s"u${i - 1}"
      val cand =
        if (i == 1)
          s"""c1 AS (SELECT query_id, doc_id, rel, CAST(NULL AS DOUBLE) AS pen
             |       FROM pool)""".stripMargin
        else
          s"""c$i AS (
             |  SELECT p.query_id, p.doc_id, p.rel,
             |    (SELECT max(pc.sim) FROM pc JOIN $prev u
             |       ON u.query_id = p.query_id AND pc.query_id = p.query_id
             |      AND ((pc.a = p.doc_id AND pc.b = u.doc_id) OR
             |           (pc.a = u.doc_id AND pc.b = p.doc_id))) AS pen
             |  FROM pool p
             |  WHERE NOT EXISTS (SELECT 1 FROM $prev u2
             |    WHERE u2.query_id = p.query_id AND u2.doc_id = p.doc_id))""".stripMargin
      val sel =
        s"""s$i AS (SELECT query_id, doc_id, mmr FROM (
           |    SELECT query_id, doc_id, $mmrExpr AS mmr, row_number() OVER (
           |      PARTITION BY query_id ORDER BY $mmrExpr DESC, doc_id) AS rn
           |    FROM c$i) WHERE rn = 1)""".stripMargin
      val uni =
        if (i == 1) s"u1 AS (SELECT query_id, doc_id, 1 AS sel_rank, mmr FROM s1)"
        else s"u$i AS (SELECT * FROM u${i - 1} UNION ALL " +
          s"SELECT query_id, doc_id, $i AS sel_rank, mmr FROM s$i)"
      s"$cand,\n$sel,\n$uni"
    }
    val steps = (1 to q128K).map(step).mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qv AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
       |cs AS (
       |  SELECT qv.query_id, e.vec_id AS doc_id,
       |    list_inner_product(qv.qv, e.v) /
       |      (sqrt(list_inner_product(qv.qv, qv.qv)) *
       |       sqrt(list_inner_product(e.v, e.v))) AS c
       |  FROM e CROSS JOIN qv WHERE qv.query_id <> e.vec_id),
       |pool AS (
       |  SELECT query_id, doc_id, round(c, 4) AS rel
       |  FROM (SELECT query_id, doc_id, c, row_number() OVER (
       |          PARTITION BY query_id ORDER BY c DESC, doc_id) AS rank FROM cs)
       |  WHERE rank <= $q128PoolN),
       |pv AS (SELECT p.query_id, p.doc_id, e.v FROM pool p
       |       JOIN e ON e.vec_id = p.doc_id),
       |pc AS (
       |  SELECT x.query_id, x.doc_id AS a, y.doc_id AS b,
       |    round(list_inner_product(x.v, y.v) /
       |      (sqrt(list_inner_product(x.v, x.v)) *
       |       sqrt(list_inner_product(y.v, y.v))), 4) AS sim
       |  FROM pv x JOIN pv y
       |    ON x.query_id = y.query_id AND x.doc_id < y.doc_id),
       |$steps
       |SELECT query_id, CAST(sel_rank AS INTEGER) AS sel_rank, doc_id, mmr
       |FROM u$q128K""".stripMargin
  }

  // ------------------- streaming HyperLogLog (§2.10 ext)
  // Register max-merge is exact/commutative/idempotent, so the
  // accumulated micro-batch state is bit-identical to the batch register
  // table for any arrival split — q129 shares q127's oracle, extending
  // the streaming-sketch family (q65 KMV, q75 MG, q76 quantiles, q78
  // count-min) with its fifth member.
  private def q129StreamingHll(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("hll_stream")
      .toString + "/state"
    (0 until 3).foreach { b =>
      graft.operators.Sketch.hllIngestBatch(
        Tables.documents(s, d).filter(col("doc_id") % 3 === b)
          .select(col("source"),
            explode(TextExprs.tokens(col("text"))).as("tok")),
        col("source"), col("tok"), q127P, state)
    }
    graft.operators.Sketch.hllEstimatesFromState(s, state, q127P)
      .select(col("grp").as("source"), col("regs_hit"), col("est_distinct"))
  }

  // ------------------- corpus snapshot diff (§2.10 ext)
  // A2's batch-over-batch diff generalized to dataset versioning:
  // added/removed/changed/unchanged per doc id across two snapshots,
  // change detection on content (hash128 in the engine, literal text
  // compare in the oracle — a collision would surface as a mismatch).
  // Snapshots are carved deterministically from `documents`.
  private def q130CorpusDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val current = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("text"))
    val previous = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev")))
          .otherwise(col("text")).as("text"))
    graft.operators.Dedup.corpusDiff(current, previous,
      col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("status"))
  }

  private val q130Sql =
    """WITH cur AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
      |prev AS (SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN text || ' rev' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0)
      |SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
      |  CASE WHEN p.doc_id IS NULL THEN 'added'
      |       WHEN c.doc_id IS NULL THEN 'removed'
      |       WHEN c.text = p.text THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id""".stripMargin

  // ------------------- unigram-LM Viterbi scoring (§2.10 ext)
  // SentencePiece-style inference: best additive-piece segmentation per
  // word, integer 1e-6 fixed-point DP — exact in both engines, so the
  // oracle's list_reduce fold and the engine's aggregate HOF replay the
  // identical scores despite different expression shapes. DP runs on
  // the distinct-token TYPE table; the corpus pays a token hash join.
  private val q131Vocab: Seq[(String, Long)] = Seq(
    "the" -> -2500000L, "ing" -> -2800000L, "and" -> -2900000L,
    "ion" -> -3000000L, "ent" -> -3200000L, "for" -> -3400000L,
    "th" -> -3000000L, "he" -> -3200000L, "in" -> -3100000L,
    "er" -> -3200000L, "an" -> -3300000L, "re" -> -3400000L,
    "on" -> -3400000L, "at" -> -3500000L, "en" -> -3500000L,
    "nd" -> -3600000L, "es" -> -3600000L, "or" -> -3700000L,
    "e" -> -3900000L, "t" -> -4000000L, "a" -> -4000000L)
  private val q131CharScore = -4200000L
  private val q131MaxPiece = 3

  private def q131UnigramNll(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.unigramNll(Tables.documents(s, d),
      col("doc_id"), col("text"), q131Vocab, q131CharScore, q131MaxPiece)
      .select(col("id").as("doc_id"), col("n_tokens"), col("nll_e6"))

  private val q131Sql = {
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
  private val q132Block = 4
  private val q132Denom = 5

  private def q132SpanCorrupt(s: SparkSession, d: String): DataFrame =
    graft.operators.Mask.spanCorrupt(Tables.documents(s, d),
      col("doc_id"), col("text"), q132Block, q132Denom)
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_masked"),
        col("masked_text"))

  private val q132Sql = {
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

  // ------------------- weighted priority sampling (§2.10 ext)
  // A-ES weighted sampling without replacement, k per source, weight =
  // token count: rank on round(ln(u)/w, 9) with u hash-derived — no
  // RNG; the oracle replays key, rank, and membership.
  private val q133K = 5

  private def q133PrioritySample(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.prioritySampleByGroup(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextExprs.tokenCount(col("text")).as("n_toks")),
      col("doc_id"), col("source"), col("n_toks"), q133K)
      .select(col("grp").as("source"), col("rank"),
        col("id").as("doc_id"), col("key"))

  private val q133Sql = {
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

  // ------------------- margin-based alignment (§2.10 ext)
  // Artetxe–Schwenk ratio-margin mining between the label<5 and label>=5
  // halves of the embedding table: NN1 pairs scored by cos over the mean
  // of both endpoints' k-neighborhood cosines (hubness cancellation),
  // with the mutual-NN flag. Cosines snap to 4, neighborhood sums are
  // decimal-exact, margin snaps to 6 — every pair oracle-replayed.
  private val q134K = 4

  // shards = 4 routes BOTH top-k passes through the no-broadcast
  // block-nested-loop plan (Similarity.shardedTopK) — the regime the
  // operator actually mines in; output is identical to the broadcast
  // path by construction (total tie order), so the oracle is shared.
  private def q134MarginAlign(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    graft.operators.Similarity.marginAlign(
      e.filter(col("label") < 5), e.filter(col("label") >= 5),
      "vec_id", "embedding", q134K, shards = 4)
  }

  private val q134Sql =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |cf AS (
       |  SELECT a.vec_id AS src, b.vec_id AS tgt,
       |    list_inner_product(a.v, b.v) /
       |      (sqrt(list_inner_product(a.v, a.v)) *
       |       sqrt(list_inner_product(b.v, b.v))) AS c
       |  FROM e a CROSS JOIN e b
       |  WHERE a.label < 5 AND b.label >= 5 AND a.vec_id <> b.vec_id),
       |rf AS (SELECT src, tgt, round(c, 4) AS cos, row_number() OVER (
       |        PARTITION BY src ORDER BY c DESC, tgt) AS rank FROM cf),
       |rb AS (SELECT src, tgt, round(c, 4) AS cos, row_number() OVER (
       |        PARTITION BY tgt ORDER BY c DESC, src) AS rank FROM cf),
       |af AS (SELECT src, CAST(sum(CAST(cos AS DECIMAL(18,4))) AS DOUBLE) /
       |        CAST(count(*) AS DOUBLE) AS avg_fwd
       |      FROM rf WHERE rank <= $q134K GROUP BY src),
       |ab AS (SELECT tgt, CAST(sum(CAST(cos AS DECIMAL(18,4))) AS DOUBLE) /
       |        CAST(count(*) AS DOUBLE) AS avg_bwd
       |      FROM rb WHERE rank <= $q134K GROUP BY tgt),
       |n1 AS (SELECT src, tgt, cos FROM rf WHERE rank = 1),
       |b1 AS (SELECT tgt, src AS back_src FROM rb WHERE rank = 1)
       |SELECT n1.src AS src_id, n1.tgt AS tgt_id, n1.cos,
       |  round(n1.cos / ((avg_fwd + avg_bwd) / 2.0), 6) AS margin,
       |  coalesce(b1.back_src = n1.src, false) AS mutual
       |FROM n1 JOIN af ON af.src = n1.src JOIN ab ON ab.tgt = n1.tgt
       |LEFT JOIN b1 ON b1.tgt = n1.tgt""".stripMargin

  // ------------------- per-source dataset card (§2.10 ext)
  // The "datasheets for datasets" panel, one query: volume, dup load,
  // mean quality, HLL distinct tokens per source — each column its
  // existing operator's shape, fused by sources-sized joins. The HLL
  // column reuses q127's full oracle as a subquery.
  private def q135DatasheetCard(s: SparkSession, d: String): DataFrame =
    graft.operators.Datasheet.perSourceCard(Tables.documents(s, d),
      col("doc_id"), col("text"), col("source"), q127P)
      .select(col("src").as("source"), col("n_docs"), col("n_tokens"),
        col("n_dup_docs"), col("mean_quality"),
        col("est_distinct_tokens"))

  private val q135Sql =
    s"""WITH base AS (
       |  SELECT doc_id, source, text,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |vol AS (SELECT source, count(*) AS n_docs,
       |      CAST(sum(len(ts)) AS BIGINT) AS n_tokens
       |    FROM base GROUP BY source),
       |qual AS (SELECT source, round(
       |      CAST(sum(CAST(round($qualitySqlBody, 6) AS DECIMAL(18,6)))
       |        AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_quality
       |    FROM documents WHERE length(trim(text)) > 0 GROUP BY source),
       |dup AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_dup_docs
       |    FROM (SELECT source, text, count(*) AS c
       |          FROM base GROUP BY source, text)
       |    WHERE c >= 2 GROUP BY source),
       |hll AS (SELECT source, est_distinct AS est_distinct_tokens
       |        FROM ($q127Sql))
       |SELECT vol.source, n_docs, n_tokens,
       |  coalesce(n_dup_docs, 0) AS n_dup_docs, mean_quality,
       |  est_distinct_tokens
       |FROM vol LEFT JOIN qual USING (source)
       |  LEFT JOIN dup USING (source) LEFT JOIN hll USING (source)""".stripMargin

  // ------------------- binary-filter evaluation (§2.10 ext)
  // The threshold-sweep precision/recall panel over q77's scores with
  // label = "is English" — where to cut the classifier before it gates
  // a mixture. One scan, one metadata row, exact counts, snap-6 ratios.
  private val q136Thresholds = Seq(0.3, 0.5, 0.7)

  private def q136FilterEval(s: SparkSession, d: String): DataFrame = {
    val scores = graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
    val labeled = scores.join(
      Tables.documents(s, d).select(col("doc_id").as("id"),
        (col("lang") === "en").cast("int").as("y")), Seq("id"))
    graft.operators.Classify.evalBinary(labeled, col("score"), col("y"),
      q136Thresholds)
  }

  private val q136Sql = {
    val aggs = q136Thresholds.zipWithIndex.map { case (t, i) =>
      s"""sum(CASE WHEN score >= CAST($t AS DOUBLE) AND y = 1 THEN 1 ELSE 0 END) AS tp_$i,
         |  sum(CASE WHEN score >= CAST($t AS DOUBLE) AND y = 0 THEN 1 ELSE 0 END) AS fp_$i,
         |  sum(CASE WHEN score < CAST($t AS DOUBLE) AND y = 1 THEN 1 ELSE 0 END) AS fn_$i,
         |  sum(CASE WHEN score < CAST($t AS DOUBLE) AND y = 0 THEN 1 ELSE 0 END) AS tn_$i""".stripMargin
    }.mkString(",\n  ")
    val rows = q136Thresholds.zipWithIndex.map { case (t, i) =>
      val (tp, fp, fn, tn) = (s"CAST(tp_$i AS DOUBLE)",
        s"CAST(fp_$i AS DOUBLE)", s"CAST(fn_$i AS DOUBLE)",
        s"CAST(tn_$i AS DOUBLE)")
      s"""SELECT CAST($t AS DOUBLE) AS threshold,
         |  CAST(tp_$i AS BIGINT) AS tp, CAST(fp_$i AS BIGINT) AS fp,
         |  CAST(fn_$i AS BIGINT) AS fn, CAST(tn_$i AS BIGINT) AS tn,
         |  CASE WHEN $tp + $fp > 0 THEN round($tp / ($tp + $fp), 6) END AS precision,
         |  CASE WHEN $tp + $fn > 0 THEN round($tp / ($tp + $fn), 6) END AS recall,
         |  CASE WHEN $tp + $tp + $fp + $fn > 0
         |       THEN round(($tp + $tp) / ($tp + $tp + $fp + $fn), 6) END AS f1
         |FROM c""".stripMargin
    }.mkString("\n UNION ALL ")
    s"""WITH sc AS (SELECT doc_id, score FROM ($q77Sql)),
       |lb AS (SELECT sc.score,
       |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM sc JOIN documents d USING (doc_id)),
       |c AS (SELECT
       |  $aggs
       |FROM lb)
       |$rows""".stripMargin
  }

  // ------------------- exact ROC-AUC (§2.10 ext)
  // Threshold-free filter quality over q77's scores: Mann–Whitney pair
  // statistic via the distinct-score count table (score grain bounds
  // it), integer 2×-scaled numerator, one snap-6 division.
  private def q137Auc(s: SparkSession, d: String): DataFrame = {
    val scores = graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
    val labeled = scores.join(
      Tables.documents(s, d).select(col("doc_id").as("id"),
        (col("lang") === "en").cast("int").as("y")), Seq("id"))
    graft.operators.Classify.aucRoc(labeled, col("score"), col("y"))
  }

  private val q137Sql =
    s"""WITH sc AS (SELECT doc_id, score FROM ($q77Sql)),
       |lb AS (SELECT sc.score AS s,
       |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM sc JOIN documents d USING (doc_id)),
       |g AS (SELECT s,
       |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
       |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
       |  FROM lb GROUP BY s),
       |c AS (SELECT s, np, nn,
       |    sum(nn) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nn AS cum_nn
       |  FROM g),
       |a AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |    CAST(sum(nn) AS BIGINT) AS n_neg,
       |    CAST(sum(np * (2 * cum_nn + nn)) AS BIGINT) AS num2 FROM c)
       |SELECT n_pos, n_neg,
       |  CASE WHEN n_pos > 0 AND n_neg > 0
       |    THEN round(CAST(num2 AS DOUBLE) /
       |      (CAST(2.0 AS DOUBLE) * CAST(n_pos * n_neg AS DOUBLE)), 6)
       |  END AS auc
       |FROM a""".stripMargin

  // ------------------- calibration bins (§2.10 ext)
  // Reliability diagram over q77's scores vs the English label —
  // completes the filter-eval family (q136 sweep, q137 AUC).
  private val q138Bins = 10

  private def q138Calibration(s: SparkSession, d: String): DataFrame = {
    val scores = graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
    val labeled = scores.join(
      Tables.documents(s, d).select(col("doc_id").as("id"),
        (col("lang") === "en").cast("int").as("y")), Seq("id"))
    graft.operators.Classify.calibrationBins(labeled, col("score"),
      col("y"), q138Bins)
  }

  private val q138Sql =
    s"""WITH sc AS (SELECT doc_id, score FROM ($q77Sql)),
       |lb AS (SELECT sc.score AS s,
       |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM sc JOIN documents d USING (doc_id)),
       |b AS (SELECT least(CAST(floor(s * CAST($q138Bins.0 AS DOUBLE))
       |        AS INT), ${q138Bins - 1}) AS bin, s, y FROM lb)
       |SELECT bin, count(*) AS n,
       |  CAST(sum(y) AS BIGINT) AS n_pos,
       |  round(CAST(sum(CAST(s AS DECIMAL(18,4))) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE), 6) AS mean_score,
       |  round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS frac_pos
       |FROM b GROUP BY bin""".stripMargin

  // ------------------- streaming temperature mixing (§2.10 ext)
  // Online q126: totals accumulate in crash-safe state; each batch's
  // keep decisions use rates from everything seen so far (including the
  // batch). The oracle unrolls the three batches with cumulative-total
  // rate CTEs — every batch's drifting rates replay exactly.
  private def q139StreamingTempMix(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("tmix_stream")
      .toString + "/state"
    val batches = (0 until 3).map { b =>
      graft.operators.Mix.temperatureSampleIngestBatch(
        Tables.documents(s, d).filter(col("doc_id") % 3 === b)
          .select(col("doc_id"), col("source"),
            TextExprs.tokenCount(col("text")).as("n_toks")),
        col("doc_id"), col("source"), col("n_toks"),
        q126Alpha, q126Budget, q126Scale, state)
    }
    batches.reduce(_.unionAll(_))
      .select(col("id").as("doc_id"), col("grp").as("source"),
        col("w").as("n_toks"), col("rate_bp"))
  }

  private val q139Sql = {
    val poly = "list_reduce(list_transform(string_split(CAST(doc_id AS VARCHAR), ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    val mh = s"((($poly * 1103515245 + 12345) % 1000000007) * 2654435761) % 1000000007"
    val aS = q126Alpha.toString
    val am1S = (q126Alpha - 1.0).toString
    val bsS = (q126Budget * q126Scale).toDouble.toString
    def batchCtes(b: Int): String =
      s"""t$b AS (SELECT source, sum(n_toks) AS t FROM rows_
         |       WHERE batch <= $b GROUP BY source HAVING sum(n_toks) > 0),
         |ta$b AS (SELECT source, t,
         |      CAST(round(exp($aS * ln(CAST(t AS DOUBLE))), 6)
         |        AS DECIMAL(38,6)) AS ea FROM t$b),
         |dn$b AS (SELECT sum(ea) AS s FROM ta$b),
         |r$b AS (
         |  SELECT source, least($q126Scale, CAST(floor(round(
         |      ($bsS * exp($am1S * ln(CAST(t AS DOUBLE)))) /
         |        CAST(s AS DOUBLE), 6)) AS BIGINT)) AS rate_bp
         |  FROM ta$b CROSS JOIN dn$b),
         |k$b AS (
         |  SELECT h.doc_id, h.source, h.n_toks, r.rate_bp
         |  FROM h JOIN r$b r USING (source)
         |  WHERE h.batch = $b AND mh % $q126Scale < rate_bp)""".stripMargin
    s"""WITH rows_ AS (
       |  SELECT doc_id, source, doc_id % 3 AS batch,
       |    CAST(len(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS BIGINT) AS n_toks
       |  FROM documents),
       |h AS (SELECT doc_id, source, batch, n_toks, $mh AS mh FROM rows_),
       |${(0 until 3).map(batchCtes).mkString(",\n")}
       |SELECT * FROM k0 UNION ALL SELECT * FROM k1 UNION ALL SELECT * FROM k2""".stripMargin
  }

  // ------------------- boilerplate n-gram mining (§2.10 ext)
  // Per-source top-k 3-grams by count (top-k WITH TIES at the k-th
  // count — the only engine-replayable boundary): the template-phrase
  // miner whose survivors feed the q119 blocklist / q105 span dedup.
  private val q140N = 3
  private val q140K = 5

  private def q140BoilerplateNgrams(s: SparkSession, d: String): DataFrame =
    graft.operators.Frequent.topNgramsPerGroup(Tables.documents(s, d),
      col("text"), col("source"), q140N, q140K)
      .select(col("grp").as("source"), col("gram"), col("cnt"))

  private val q140Sql =
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

  // ------------------- ANN recall monitoring (§2.10 ext)
  // recall@k of the multi-probe LSH IVF (q22) against the exact top-k
  // (q21), per query — index quality as a first-class, oracle-checked
  // pipeline diagnostic rather than a test-only figure. Both arms are
  // the registered queries' own plans; the oracle composes both
  // registered oracles verbatim.
  private def q141AnnRecall(s: SparkSession, d: String): DataFrame = {
    val exact = q21CosineTopK(s, d)
      .select(col("query_id"), col("neighbor_id"))
    val approx = q22CosineIvf(s, d)
      .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
    exact.join(approx,
        col("query_id") === col("aq") && col("neighbor_id") === col("an"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), count(col("an")).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        round(col("n_hit").cast("double") / col("k").cast("double"), 6)
          .as("recall"))
  }

  private val q141Sql =
    s"""WITH ex AS (SELECT query_id, neighbor_id FROM ($q21Sql)),
       |ap AS (SELECT query_id AS aq, neighbor_id AS an FROM ($q22Sql))
       |SELECT query_id, CAST(count(an) AS BIGINT) AS n_hit,
       |  round(CAST(count(an) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS recall
       |FROM ex LEFT JOIN ap ON query_id = aq AND neighbor_id = an
       |GROUP BY query_id""".stripMargin

  // ------------------- per-source AUC (§2.10 ext)
  // q137 sliced by source — the filter-bias diagnostic: a classifier
  // ranking well globally can be near-random on one source.
  private def q142AucBySource(s: SparkSession, d: String): DataFrame = {
    val scores = graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
    val labeled = scores.join(
      Tables.documents(s, d).select(col("doc_id").as("id"), col("source"),
        (col("lang") === "en").cast("int").as("y")), Seq("id"))
    graft.operators.Classify.aucRocByGroup(labeled, col("score"),
      col("y"), col("source"))
      .select(col("grp").as("source"), col("n_pos"), col("n_neg"),
        col("auc"))
  }

  private val q142Sql =
    s"""WITH sc AS (SELECT doc_id, score FROM ($q77Sql)),
       |lb AS (SELECT d.source, sc.score AS s,
       |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM sc JOIN documents d USING (doc_id)),
       |g AS (SELECT source, s,
       |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
       |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
       |  FROM lb GROUP BY source, s),
       |c AS (SELECT source, s, np, nn,
       |    sum(nn) OVER (PARTITION BY source ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nn AS cum_nn
       |  FROM g),
       |a AS (SELECT source, CAST(sum(np) AS BIGINT) AS n_pos,
       |    CAST(sum(nn) AS BIGINT) AS n_neg,
       |    CAST(sum(np * (2 * cum_nn + nn)) AS BIGINT) AS num2
       |  FROM c GROUP BY source)
       |SELECT source, n_pos, n_neg,
       |  CASE WHEN n_pos > 0 AND n_neg > 0
       |    THEN round(CAST(num2 AS DOUBLE) /
       |      (CAST(2.0 AS DOUBLE) * CAST(n_pos * n_neg AS DOUBLE)), 6)
       |  END AS auc
       |FROM a""".stripMargin

  // ------------------- filter agreement, Cohen's kappa (§2.10 ext)
  // Does the learned gate (q77 score >= 0.5) agree with the rule gate
  // (q101 Gopher keep) beyond what their keep rates force? The
  // redundancy diagnostic for stacked quality filters.
  private def q143FilterKappa(s: SparkSession, d: String): DataFrame = {
    val scores = graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
      .select(col("id").as("doc_id"),
        (col("score") >= 0.5).as("pa"))
    val gopher = q101GopherRules(s, d)
      .select(col("doc_id"), col("keep").as("pb"))
    graft.operators.Classify.agreementKappa(
      scores.join(gopher, Seq("doc_id")), col("pa"), col("pb"))
  }

  private val q143Sql =
    s"""WITH sc AS (SELECT doc_id, score >= CAST(0.5 AS DOUBLE) AS pa
       |           FROM ($q77Sql)),
       |gp AS (SELECT doc_id, keep AS pb FROM ($q101Sql)),
       |j AS (SELECT pa, pb FROM sc JOIN gp USING (doc_id)),
       |c AS (SELECT
       |    sum(CASE WHEN pa AND pb THEN 1 ELSE 0 END) AS n_both,
       |    sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END) AS n_only_a,
       |    sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END) AS n_only_b,
       |    sum(CASE WHEN NOT pa AND NOT pb THEN 1 ELSE 0 END) AS n_neither
       |  FROM j)
       |SELECT CAST(n_both AS BIGINT) AS n_both, CAST(n_only_a AS BIGINT) AS n_only_a,
       |  CAST(n_only_b AS BIGINT) AS n_only_b, CAST(n_neither AS BIGINT) AS n_neither,
       |  round(CAST(n_both + n_neither AS DOUBLE) /
       |    CAST(n_both + n_only_a + n_only_b + n_neither AS DOUBLE), 6) AS po,
       |  CASE WHEN CAST((n_both + n_only_a) * (n_both + n_only_b) +
       |        (n_only_b + n_neither) * (n_only_a + n_neither) AS DOUBLE) /
       |      (CAST(n_both + n_only_a + n_only_b + n_neither AS DOUBLE) *
       |       CAST(n_both + n_only_a + n_only_b + n_neither AS DOUBLE)) < 1.0
       |    THEN round((CAST(n_both + n_neither AS DOUBLE) /
       |        CAST(n_both + n_only_a + n_only_b + n_neither AS DOUBLE) -
       |      CAST((n_both + n_only_a) * (n_both + n_only_b) +
       |        (n_only_b + n_neither) * (n_only_a + n_neither) AS DOUBLE) /
       |      (CAST(n_both + n_only_a + n_only_b + n_neither AS DOUBLE) *
       |       CAST(n_both + n_only_a + n_only_b + n_neither AS DOUBLE))) /
       |      (1.0 - CAST((n_both + n_only_a) * (n_both + n_only_b) +
       |        (n_only_b + n_neither) * (n_only_a + n_neither) AS DOUBLE) /
       |      (CAST(n_both + n_only_a + n_only_b + n_neither AS DOUBLE) *
       |       CAST(n_both + n_only_a + n_only_b + n_neither AS DOUBLE))), 6)
       |  END AS kappa
       |FROM c""".stripMargin

  // ------------------- average precision / PR-AUC (§2.10 ext)
  // The class-imbalance companion of q137: precision–recall area by the
  // threshold-step sum over q77's scores vs the English label. Same
  // distinct-score count-table shape as q137; per-threshold precision
  // is one IEEE division, terms snap to 9 and sum in DECIMAL, one
  // snap-6 division by n_pos.
  private def q144AvgPrecision(s: SparkSession, d: String): DataFrame = {
    val scores = graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
    val labeled = scores.join(
      Tables.documents(s, d).select(col("doc_id").as("id"),
        (col("lang") === "en").cast("int").as("y")), Seq("id"))
    graft.operators.Classify.averagePrecision(labeled, col("score"), col("y"))
  }

  private val q144Sql =
    s"""WITH sc AS (SELECT doc_id, score FROM ($q77Sql)),
       |lb AS (SELECT sc.score AS s,
       |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM sc JOIN documents d USING (doc_id)),
       |g AS (SELECT s,
       |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
       |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
       |  FROM lb GROUP BY s),
       |c AS (SELECT s, np, nn,
       |    sum(np) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
       |    sum(np + nn) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
       |  FROM g),
       |a AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |    CAST(sum(nn) AS BIGINT) AS n_neg,
       |    sum(CAST(round(CAST(np AS DOUBLE) *
       |      (CAST(cum_tp AS DOUBLE) / CAST(cum_n AS DOUBLE)), 9)
       |      AS DECIMAL(38,9))) AS num FROM c)
       |SELECT n_pos, n_neg,
       |  CASE WHEN n_pos > 0
       |    THEN round(CAST(num AS DOUBLE) / CAST(n_pos AS DOUBLE), 6)
       |  END AS ap
       |FROM a""".stripMargin

  // ------------------- ANN recall ladder (§2.10 embeddings)
  // q141 covered the hash-bucket IVF arm; these close the quantization
  // family: every approximate serving layout gets a REGISTERED recall
  // query against its own metric's exact baseline (ADC ranks by L2 →
  // exact L2; SQ8 ranks by inner product → exact dot; BQ reranks by
  // cosine → exact cosine). q146/q147's arms are fully deterministic, so
  // their recall tables are EXACT oracle compositions (q141 pattern);
  // q145/q148 use MLlib k-means coarse centroids — not SQL-replayable —
  // so they assert the q31 recall-floor pattern instead, with measured
  // values documented in SCALE.md.

  /** Per-query hit counts of an approximate arm against its exact
    * baseline — the raw recall table the floors below assert over (and
    * what Smoke prints when re-measuring the documented figures). */
  private def recallHits(qset: DataFrame, ann: DataFrame,
                         exact: DataFrame): DataFrame = {
    val hitCounts = ann.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    qset.select(col("vec_id").as("query_id"))
      .join(hitCounts, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** q31's floor tail: `recall_ok` = per-query floor AND total floor
    * (the bounded-window form of the repo-wide rule). */
  private def recallFloor(hits: DataFrame, perQueryFloor: Long,
                          totalFloor: Long): DataFrame =
    hits.select(col("query_id"),
      (col("hits") >= perQueryFloor &&
        sum(col("hits")).over(Window.partitionBy(pmod(col("hits"), lit(1L))))
          >= totalFloor).as("recall_ok"))

  // Learned-coarse IVF-PQ: the k-means coarse quantizer (Quantize
  // .learnedCoarse — equalized list populations, the property the
  // nProbe/nLists pruning claim assumes) + seed-row PQ codebook +
  // two-stage serving (ADC shortlist R=200, exact L2 re-rank).
  // Floors follow q31's discipline: each of the 10 queries must land
  // >= 1 of its 5 true L2 neighbors AND the total must reach 20/50
  // (recall >= 0.4 with margin). Measured hits@5 (seed 42, local[32]):
  //   q145  sf0.001: Σ45 (.90)   sf0.01: Σ40 (.80)   sf0.1: Σ28 (.56)
  //   q148  sf0.001: Σ45 (.90)   sf0.01: Σ40 (.80)   sf0.1: Σ34 (.68)
  // (re-measure with `runMain graft.tools.RecallMeasure`).
  private val q145NProbe = 4 // half the lists: the recall queries' probe budget
  private val q145Shortlist = 200 // ADC shortlist R >> k, exact-reranked
  private val q145PerQueryFloor = 1L
  private val q145TotalFloor = 20L

  private[graft] def q145HitsTable(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val cb = graft.operators.Quantize.seedCodebook(embs, col("vec_id"),
      col("embedding"), pqSeedIds)
    val coarse = graft.operators.Quantize.learnedCoarse(embs,
      col("embedding"), nLists = 8, seed = 42L)
    val codes = graft.operators.Quantize.pqEncode(embs, col("vec_id"),
        col("embedding"), cb, pqM, pqDim,
        keep = Seq(graft.operators.Quantize.ivfListCol(col("embedding"),
          coarse).as("list_id")))
      .drop("distortion")
    val qset = embs.filter(col("vec_id") < 10)
    // two-stage serving: ADC shortlist (R = 50 per query) → exact L2
    // re-rank of the survivors — quantization error costs recall only
    // via shortlist misses, the standard IVFADC deployment shape
    val shortlist = graft.operators.Quantize.ivfPqTopK(codes, qset,
      "vec_id", "embedding", coarse, cb, pqM, pqDim, q145NProbe, k = q145Shortlist)
    val ann = graft.operators.Quantize.rerankL2(shortlist, embs, qset,
      "vec_id", "embedding", k = 5)
    val exact = Similarity.bruteForceTopKL2(embs, qset,
      "vec_id", "embedding", k = 5)
    recallHits(qset, ann, exact)
  }

  private def q145IvfPqLearnedRecall(s: SparkSession, d: String): DataFrame =
    recallFloor(q145HitsTable(s, d), q145PerQueryFloor, q145TotalFloor)

  private val q145Sql =
    s"""SELECT CAST(range AS BIGINT) AS query_id, true AS recall_ok
       |FROM range(10)""".stripMargin

  // SQ8 recall vs exact maximum-inner-product top-k: both arms are
  // deterministic, so the recall table is an exact oracle composition.
  private def q146Sq8Recall(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val qset = embs.filter(col("vec_id") < 5)
    val ann = graft.operators.Quantize.sq8TopK(embs, qset,
      "vec_id", "embedding", k = 3)
      .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
    val exact = Similarity.bruteForceTopKDot(embs, qset,
      "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"))
    exact.join(ann,
        col("query_id") === col("aq") && col("neighbor_id") === col("an"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), count(col("an")).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        round(col("n_hit").cast("double") / col("k").cast("double"), 6)
          .as("recall"))
  }

  private val q146Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         list_inner_product(q.qv, c.v) AS score
       |       FROM e c CROSS JOIN qs q WHERE q.query_id <> c.vec_id),
       |ex AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (
       |     PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS r
       |   FROM sc) WHERE r <= 3),
       |ap AS (SELECT query_id AS aq, neighbor_id AS an FROM ($q99Sql))
       |SELECT query_id, CAST(count(an) AS BIGINT) AS n_hit,
       |  round(CAST(count(an) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS recall
       |FROM ex LEFT JOIN ap ON query_id = aq AND neighbor_id = an
       |GROUP BY query_id""".stripMargin

  // BQ recall vs exact cosine top-k: the Hamming candidate cut is the
  // only recall loss (the rerank is exact cosine), so this measures
  // exactly what the 1-bit signature costs. Fully composed oracle.
  private def q147BqRecall(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val qset = embs.filter(col("vec_id") < 5)
    val ann = q104BqTopK(s, d)
      .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
    val exact = Similarity.bruteForceTopK(embs, qset,
      "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"))
    exact.join(ann,
        col("query_id") === col("aq") && col("neighbor_id") === col("an"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), count(col("an")).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        round(col("n_hit").cast("double") / col("k").cast("double"), 6)
          .as("recall"))
  }

  private val q147Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         list_inner_product(q.qv, c.v) /
       |           (sqrt(list_inner_product(q.qv, q.qv)) *
       |            sqrt(list_inner_product(c.v, c.v))) AS cs
       |       FROM e c CROSS JOIN qs q WHERE q.query_id <> c.vec_id),
       |ex AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (
       |     PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS r
       |   FROM sc) WHERE r <= 3),
       |ap AS (SELECT query_id AS aq, neighbor_id AS an FROM ($q104Sql))
       |SELECT query_id, CAST(count(an) AS BIGINT) AS n_hit,
       |  round(CAST(count(an) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS recall
       |FROM ex LEFT JOIN ap ON query_id = aq AND neighbor_id = an
       |GROUP BY query_id""".stripMargin

  // Learned-coarse residual IVFADC (the full Jégou formulation under a
  // k-means coarse quantizer): residual PQ codebook re-derived against
  // the learned centroids; same floors discipline as q145.
  private val q148PerQueryFloor = 1L
  private val q148TotalFloor = 20L

  private[graft] def q148HitsTable(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val coarse = graft.operators.Quantize.learnedCoarse(embs,
      col("embedding"), nLists = 8, seed = 42L)
    val rb = graft.operators.Quantize.residualSeedCodebook(embs,
      col("vec_id"), col("embedding"), pqSeedIds, coarse)
    val listC = graft.operators.Quantize.ivfListCol(col("embedding"), coarse)
    val codes = graft.operators.Quantize.pqEncode(embs, col("vec_id"),
        graft.operators.Quantize.ivfResidualCol(col("embedding"), coarse,
          listC),
        rb, pqM, pqDim, keep = Seq(listC.as("list_id")))
      .drop("distortion")
    val qset = embs.filter(col("vec_id") < 10)
    val shortlist = graft.operators.Quantize.ivfPqResidualTopK(codes, qset,
      "vec_id", "embedding", coarse, rb, pqM, pqDim, q145NProbe, k = q145Shortlist)
    val ann = graft.operators.Quantize.rerankL2(shortlist, embs, qset,
      "vec_id", "embedding", k = 5)
    val exact = Similarity.bruteForceTopKL2(embs, qset,
      "vec_id", "embedding", k = 5)
    recallHits(qset, ann, exact)
  }

  private def q148IvfadcLearnedRecall(s: SparkSession, d: String): DataFrame =
    recallFloor(q148HitsTable(s, d), q148PerQueryFloor, q148TotalFloor)

  private val q148Sql =
    s"""SELECT CAST(range AS BIGINT) AS query_id, true AS recall_ok
       |FROM range(10)""".stripMargin

  // ------------------- per-source average precision (§2.10 ext)
  // q144 sliced by source — AP is prevalence-sensitive by design, so the
  // only fair read of a source's ranking quality compares its AP to its
  // OWN prevalence; that needs the per-group table.
  private def q149ApBySource(s: SparkSession, d: String): DataFrame = {
    val scores = graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
    val labeled = scores.join(
      Tables.documents(s, d).select(col("doc_id").as("id"), col("source"),
        (col("lang") === "en").cast("int").as("y")), Seq("id"))
    graft.operators.Classify.averagePrecisionByGroup(labeled, col("score"),
      col("y"), col("source"))
      .select(col("grp").as("source"), col("n_pos"), col("n_neg"), col("ap"))
  }

  private val q149Sql =
    s"""WITH sc AS (SELECT doc_id, score FROM ($q77Sql)),
       |lb AS (SELECT d.source, sc.score AS s,
       |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM sc JOIN documents d USING (doc_id)),
       |g AS (SELECT source, s,
       |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
       |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
       |  FROM lb GROUP BY source, s),
       |c AS (SELECT source, s, np, nn,
       |    sum(np) OVER (PARTITION BY source ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
       |    sum(np + nn) OVER (PARTITION BY source ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
       |  FROM g),
       |a AS (SELECT source, CAST(sum(np) AS BIGINT) AS n_pos,
       |    CAST(sum(nn) AS BIGINT) AS n_neg,
       |    sum(CAST(round(CAST(np AS DOUBLE) *
       |      (CAST(cum_tp AS DOUBLE) / CAST(cum_n AS DOUBLE)), 9)
       |      AS DECIMAL(38,9))) AS num FROM c GROUP BY source)
       |SELECT source, n_pos, n_neg,
       |  CASE WHEN n_pos > 0
       |    THEN round(CAST(num AS DOUBLE) / CAST(n_pos AS DOUBLE), 6)
       |  END AS ap
       |FROM a""".stripMargin

  // ------------------- retrieval eval: nDCG@k and RR@k (§2.10 ext)
  // The retrieval-side companion of the classifier eval family: the
  // multi-probe LSH IVF arm (q22) evaluated against GRADED relevance
  // derived from the exact cosine top-5 (q21: rel = 6 − exact rank).
  // Both arms are the registered queries' own plans, so the oracles are
  // exact compositions (q141 pattern); the transcendental DCG terms
  // snap to 1e-9 fixed-point per position before any sum.
  private def q150Ranked(s: SparkSession, d: String): DataFrame =
    q22CosineIvf(s, d).select(col("query_id"), col("rank"),
      col("neighbor_id").as("doc_id"))

  private def q150Qrels(s: SparkSession, d: String): DataFrame =
    q21CosineTopK(s, d).select(col("query_id"),
      col("neighbor_id").as("doc_id"), (lit(6) - col("rank")).as("rel"))

  private def q150NdcgIvf(s: SparkSession, d: String): DataFrame =
    graft.operators.Retrieval.ndcgAtK(q150Ranked(s, d), q150Qrels(s, d),
      k = 5)

  private val q150Sql =
    s"""WITH rk AS (SELECT query_id, rank, neighbor_id AS doc_id FROM ($q22Sql)),
       |qr AS (SELECT query_id, neighbor_id AS doc_id, 6 - rank AS rel
       |       FROM ($q21Sql)),
       |j AS (SELECT r.query_id, r.rank, COALESCE(q.rel, 0) AS rel
       |      FROM rk r LEFT JOIN qr q
       |        ON r.query_id = q.query_id AND r.doc_id = q.doc_id),
       |dcg AS (SELECT query_id,
       |    CAST(sum(CAST(round((pow(2.0, rel) - 1) / log2(rank + 1.0) * 1e9)
       |      AS BIGINT)) AS BIGINT) AS dcg_e9
       |  FROM j GROUP BY query_id),
       |ir AS (SELECT query_id, rel,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, doc_id) AS irank
       |  FROM qr WHERE rel > 0),
       |idcg AS (SELECT query_id,
       |    CAST(sum(CAST(round((pow(2.0, rel) - 1) / log2(irank + 1.0) * 1e9)
       |      AS BIGINT)) AS BIGINT) AS idcg_e9
       |  FROM ir WHERE irank <= 5 GROUP BY query_id),
       |qq AS (SELECT DISTINCT query_id FROM rk)
       |SELECT q.query_id, COALESCE(dcg_e9, 0) AS dcg_e9,
       |  COALESCE(idcg_e9, 0) AS idcg_e9,
       |  CASE WHEN COALESCE(idcg_e9, 0) > 0
       |    THEN round(CAST(COALESCE(dcg_e9, 0) AS DOUBLE) /
       |      CAST(idcg_e9 AS DOUBLE), 6)
       |  END AS ndcg
       |FROM qq q LEFT JOIN dcg USING (query_id)
       |LEFT JOIN idcg USING (query_id)""".stripMargin

  private def q151RrIvf(s: SparkSession, d: String): DataFrame =
    graft.operators.Retrieval.reciprocalRankAtK(q150Ranked(s, d),
      q150Qrels(s, d), k = 5)

  private val q151Sql =
    s"""WITH rk AS (SELECT query_id, rank, neighbor_id AS doc_id FROM ($q22Sql)),
       |qr AS (SELECT query_id, neighbor_id AS doc_id, 6 - rank AS rel
       |       FROM ($q21Sql)),
       |hit AS (SELECT query_id, min(rank) AS first_rel_rank
       |  FROM rk JOIN qr USING (query_id, doc_id)
       |  WHERE rel > 0 GROUP BY query_id),
       |qq AS (SELECT DISTINCT query_id FROM rk)
       |SELECT q.query_id, first_rel_rank,
       |  COALESCE(round(1.0 / first_rel_rank, 6), 0.0) AS rr
       |FROM qq q LEFT JOIN hit USING (query_id)""".stripMargin

  // ------------------- corpus mix drift (§2.10 ext)
  // The monitoring panel between two ingest snapshots: simulate an
  // upstream outage (src3 vanishes) plus a partial shift (half of src7)
  // and report per-source token-share deltas + the snap-9 JS-divergence
  // contributions. Shares are exact int ratios; the ln terms snap to
  // 1e-9 fixed-point per source (q72 discipline) so the oracle replays
  // every row.
  private def q152MixDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val newer = docs.filter(col("source") =!= "src3" &&
      !(col("source") === "src7" && col("doc_id") % 2 === 0))
    graft.operators.Datasheet.mixDrift(docs, newer,
      col("text"), col("source"))
  }

  private val q152Sql =
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

  // ------------------- streaming mix drift (§2.10 ext)
  // q152's monitoring panel in its real regime: the "new" snapshot
  // arrives in three arbitrary micro-batches folded into the per-source
  // volume state (counts are additive, so the accumulated state equals
  // the one-shot volumes EXACTLY — no ordering caveat), then one drift
  // read against the reference volumes. Identical output to q152 by
  // construction, so the oracle is q152's SQL verbatim.
  private def q153StreamingMixDrift(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("mixdrift_stream")
      .toString
    val docs = Tables.documents(s, d)
    val newer = docs.filter(col("source") =!= "src3" &&
      !(col("source") === "src7" && col("doc_id") % 2 === 0))
    (0 until 3).foreach { b =>
      graft.streaming.MixDriftStream.ingestBatch(s,
        newer.filter(col("doc_id") % 3 === b),
        col("text"), col("source"), state)
    }
    graft.streaming.MixDriftStream.driftVsReference(s, state,
      graft.operators.Datasheet.sourceVolumes(docs,
        col("text"), col("source")))
  }

  // ------------------- expected calibration error (§2.10 ext)
  // q138's reliability diagram reduced to the standard scalar:
  // ECE = Σ_b (n_b/N)·|frac_pos − mean_score| over the same exact bins
  // (snap-6 per-bin values, snap-9 weighted gaps, one snap-6 division).
  private def q154Ece(s: SparkSession, d: String): DataFrame = {
    val scores = graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
    val labeled = scores.join(
      Tables.documents(s, d).select(col("doc_id").as("id"),
        (col("lang") === "en").cast("int").as("y")), Seq("id"))
    graft.operators.Classify.calibrationError(labeled, col("score"),
      col("y"), q138Bins)
  }

  private val q154Sql =
    s"""WITH bins AS ($q138Sql)
       |SELECT CAST(sum(n) AS BIGINT) AS n,
       |  round(CAST(sum(CAST(round(CAST(n AS DOUBLE) *
       |      abs(frac_pos - mean_score) * 1e9) AS BIGINT)) AS DOUBLE)
       |    / 1e9 / CAST(sum(n) AS DOUBLE), 6) AS ece
       |FROM bins""".stripMargin

  // ------------------- streaming decontamination (§2.10 ext)
  // q62's regime made honest: corpus documents AND benchmark suites both
  // arrive incrementally (three batches, split by id % 3 — most
  // doc/benchmark gram encounters cross batch boundaries in BOTH
  // directions: doc-before-gram and gram-before-doc). Each hit is
  // counted when its later side arrives, so the accumulated read equals
  // the one-shot batch operator for any arrival split and q62's oracle
  // certifies this query verbatim.
  private def q156StreamingContam(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("contam_stream")
      .toString
    val docs = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text"))
    (0 until 3).foreach { b =>
      val arrivals = docs.filter(col("id") % 3 === b)
      graft.streaming.ContamStream.ingestBatch(s,
        newDocs = arrivals.filter(col("id") % q62BenchMod =!= 0),
        newBench = arrivals.filter(col("id") % q62BenchMod === 0),
        stateDir = state, n = 3)
    }
    graft.streaming.ContamStream.contamination(s, state)
      .select(col("id").as("doc_id"), col("n_shingles"), col("n_overlap"),
        col("contaminated"))
  }

  // ------------------- per-source contamination rate (§2.10 ext)
  // q62's datasheet rollup: which FEED is leaking eval data. Contaminated-
  // doc rate and micro-averaged gram overlap share per source — exact
  // long sums, one division each at the end (order-free, cross-engine
  // exact).
  private def q157ContamBySource(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Contamination.rateBySource(
      q62Decontaminate(s, d).withColumnRenamed("doc_id", "id"),
      docs.select(col("doc_id").as("id"), col("source")))
  }

  private val q157Sql =
    s"""WITH c AS ($q62Sql)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_contaminated,
       |  round(CAST(sum(CASE WHEN contaminated THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS contam_rate,
       |  CAST(sum(n_shingles) AS BIGINT) AS n_shingles,
       |  CAST(sum(n_overlap) AS BIGINT) AS n_overlap,
       |  round(CAST(sum(n_overlap) AS DOUBLE)
       |    / CAST(sum(n_shingles) AS DOUBLE), 6) AS overlap_share
       |FROM c JOIN documents d ON c.doc_id = d.doc_id
       |GROUP BY d.source""".stripMargin

  // ------------------- score-distribution drift (§2.10 ext)
  // The deployed-filter monitor: the q77 classifier is FROZEN, so a
  // moved score histogram between the reference corpus and the q152
  // "newer" snapshot means the DATA changed and every mixture cut tuned
  // on the old distribution is re-based. Per-bin JS contributions on the
  // calibration-bin grid (PSI's job without PSI's empty-bin epsilon
  // hack), q152's 1e-9 fixed-point discipline.
  private def q160ScoreDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    def scored(df: DataFrame) = graft.operators.Classify.hashedLinearScore(
      df, col("doc_id"), col("text"), q77Weights, q77Bias)
    val newer = docs.filter(col("source") =!= "src3" &&
      !(col("source") === "src7" && col("doc_id") % 2 === 0))
    graft.operators.Classify.scoreDrift(scored(docs), scored(newer),
      col("score"), q138Bins)
  }

  private val q160Sql =
    s"""WITH sc AS (SELECT doc_id, score FROM ($q77Sql)),
       |bb AS (SELECT doc_id,
       |    least(CAST(floor(score * CAST($q138Bins.0 AS DOUBLE)) AS INTEGER),
       |      ${q138Bins - 1}) AS bin FROM sc),
       |rb AS (SELECT bin, count(*) AS ref_n FROM bb GROUP BY bin),
       |cb AS (SELECT bin, count(*) AS cur_n FROM bb
       |  JOIN documents d USING (doc_id)
       |  WHERE d.source <> 'src3'
       |    AND NOT (d.source = 'src7' AND d.doc_id % 2 = 0)
       |  GROUP BY bin),
       |j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
       |    coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
       |  FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
       |t AS (SELECT CAST(sum(ref_n) AS BIGINT) AS rt,
       |    CAST(sum(cur_n) AS BIGINT) AS ct FROM j),
       |x AS (SELECT j.*,
       |    CAST(ref_n AS DOUBLE) / CAST(greatest(rt, 1) AS DOUBLE) AS p,
       |    CAST(cur_n AS DOUBLE) / CAST(greatest(ct, 1) AS DOUBLE) AS q
       |  FROM j CROSS JOIN t)
       |SELECT bin, CAST(ref_n AS BIGINT) AS ref_n,
       |  CAST(cur_n AS BIGINT) AS cur_n,
       |  round(p, 6) AS ref_share, round(q, 6) AS cur_share,
       |  round(q - p, 6) AS delta_share,
       |  CAST(round((CASE WHEN ref_n = 0 AND cur_n = 0 THEN 0.0
       |    ELSE (CASE WHEN ref_n > 0
       |            THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END) +
       |         (CASE WHEN cur_n > 0
       |            THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)
       |    END) * 1e9) AS BIGINT) AS js_e9
       |FROM x""".stripMargin

  // ------------------- cross-source near-dup matrix (§2.10 ext)
  // q121's gram-overlap matrix asked at the DOCUMENT level: verified
  // near-dup pairs (q19's own plan) bucketed by order-normalized source
  // pair — which feeds duplicate each other (off-diagonal) and each
  // feed's internal dup load (diagonal).
  private def q164NearDupMatrix(s: SparkSession, d: String): DataFrame =
    graft.operators.Datasheet.nearDupSourceMatrix(
      q19MinhashLsh(s, d).select(col("id_a"), col("id_b")),
      Tables.documents(s, d)
        .select(col("doc_id").as("id"), col("source")))

  private val q164Sql =
    s"""WITH pr AS (SELECT id_a, id_b FROM ($q19Sql)),
       |j AS (SELECT least(da.source, db.source) AS src_a,
       |    greatest(da.source, db.source) AS src_b
       |  FROM pr JOIN documents da ON da.doc_id = pr.id_a
       |          JOIN documents db ON db.doc_id = pr.id_b)
       |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
       |FROM j GROUP BY src_a, src_b""".stripMargin

  // ------------------- exact KS drift on token counts (§2.10 ext)
  // Bin-free distribution drift beside the histogram monitors: exact
  // two-sample Kolmogorov–Smirnov on the per-doc token count between
  // the corpus and the q152 "newer" snapshot — max CDF gap and where it
  // occurs, integer cross-product numerators in DECIMAL(38,0).
  private def q165KsDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val newer = docs.filter(col("source") =!= "src3" &&
      !(col("source") === "src7" && col("doc_id") % 2 === 0))
    graft.operators.Datasheet.ksDrift(docs, newer,
      TextExprs.tokenCount(col("text")))
  }

  private val q165Sql =
    """WITH tok AS (SELECT source, doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS v
      |  FROM documents),
      |r AS (SELECT v, count(*) AS rn FROM tok GROUP BY v),
      |c AS (SELECT v, count(*) AS cn FROM tok
      |  WHERE source <> 'src3' AND NOT (source = 'src7' AND doc_id % 2 = 0)
      |  GROUP BY v),
      |j AS (SELECT coalesce(r.v, c.v) AS v, coalesce(rn, 0) AS rn,
      |    coalesce(cn, 0) AS cn
      |  FROM r FULL OUTER JOIN c ON r.v = c.v),
      |t AS (SELECT CAST(sum(rn) AS BIGINT) AS nr,
      |    CAST(sum(cn) AS BIGINT) AS nc FROM j),
      |cum AS (SELECT v,
      |    sum(rn) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
      |    sum(cn) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      |  FROM j),
      |g AS (SELECT v, nr, nc,
      |    abs(CAST(cr AS HUGEINT) * nc - CAST(cc AS HUGEINT) * nr) AS gap
      |  FROM cum CROSS JOIN t),
      |m AS (SELECT max(gap) AS mg FROM g)
      |SELECT nr AS n_ref, nc AS n_cur,
      |  CASE WHEN nr > 0 AND nc > 0 THEN
      |    round(CAST(mg AS DOUBLE) /
      |      (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)), 6)
      |  END AS ks,
      |  CAST(min(v) AS BIGINT) AS ks_at
      |FROM g CROSS JOIN m WHERE gap = mg
      |GROUP BY nr, nc, mg""".stripMargin

  // ------------------- per-source KS drift (§2.10 ext)
  // q165 sliced: a token-count distribution can hold globally while one
  // feed's collapses (truncation bug, format change). Window PROPERLY
  // partitioned by source; src3 (absent from the newer snapshot) yields
  // null ks by contract.
  private def q171KsBySource(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val newer = docs.filter(col("source") =!= "src3" &&
      !(col("source") === "src7" && col("doc_id") % 2 === 0))
    graft.operators.Datasheet.ksDriftByGroup(docs, newer,
        TextExprs.tokenCount(col("text")), col("source"))
      .withColumnRenamed("grp", "source")
  }

  private val q171Sql =
    """WITH tok AS (SELECT source, doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS v
      |  FROM documents),
      |r AS (SELECT source AS grp, v, count(*) AS rn FROM tok GROUP BY 1, 2),
      |c AS (SELECT source AS grp, v, count(*) AS cn FROM tok
      |  WHERE source <> 'src3' AND NOT (source = 'src7' AND doc_id % 2 = 0)
      |  GROUP BY 1, 2),
      |j AS (SELECT coalesce(r.grp, c.grp) AS grp, coalesce(r.v, c.v) AS v,
      |    coalesce(rn, 0) AS rn, coalesce(cn, 0) AS cn
      |  FROM r FULL OUTER JOIN c ON r.grp = c.grp AND r.v = c.v),
      |t AS (SELECT grp, CAST(sum(rn) AS BIGINT) AS nr,
      |    CAST(sum(cn) AS BIGINT) AS nc FROM j GROUP BY grp),
      |cum AS (SELECT grp, v,
      |    sum(rn) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
      |    sum(cn) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      |  FROM j),
      |g AS (SELECT cum.grp, v, nr, nc,
      |    abs(CAST(cr AS HUGEINT) * nc - CAST(cc AS HUGEINT) * nr) AS gap
      |  FROM cum JOIN t ON cum.grp = t.grp),
      |m AS (SELECT grp, max(gap) AS mg FROM g GROUP BY grp)
      |SELECT g.grp AS source, nr AS n_ref, nc AS n_cur,
      |  CASE WHEN nr > 0 AND nc > 0 THEN
      |    round(CAST(mg AS DOUBLE) /
      |      (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)), 6)
      |  END AS ks,
      |  CAST(min(v) AS BIGINT) AS ks_at
      |FROM g JOIN m ON g.grp = m.grp AND g.gap = m.mg
      |GROUP BY g.grp, nr, nc, mg""".stripMargin

  // ------------------- per-source novel-gram rate (§2.10 ext)
  // Which feed brings NEW content vs re-crawls what the corpus already
  // has: distinct grams per source of the full (new) snapshot, counted
  // novel when absent from the q152 "newer" reference snapshot — so the
  // novelty here is exactly the dropped src3 + half-src7 content
  // resurfacing.
  private def q166NovelGrams(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val ref = docs.filter(col("source") =!= "src3" &&
      !(col("source") === "src7" && col("doc_id") % 2 === 0))
    graft.operators.Datasheet.novelGramsBySource(ref, docs,
      col("text"), col("source"))
  }

  private val q166Sql =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, source, unnest(list_distinct(
      |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
      |  )) AS g FROM toks WHERE len(ts) > 0),
      |old AS (SELECT DISTINCT g FROM sh
      |  WHERE source <> 'src3' AND NOT (source = 'src7' AND doc_id % 2 = 0)),
      |nw AS (SELECT DISTINCT source AS src, g FROM sh)
      |SELECT src, CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(sum(CASE WHEN o.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  round(CAST(sum(CASE WHEN o.g IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS novelty_rate
      |FROM nw LEFT JOIN old o USING (g)
      |GROUP BY src""".stripMargin

  // ------------------- split-leakage report (§2.10 ext)
  // THE check before trusting a val/test number: near-dup pairs that
  // straddle split boundaries (q19's verified pairs × q87's hash split
  // assignment). An off-diagonal (train,val)/(train,test) row means the
  // eval set contains near-copies of training docs and its loss is
  // fiction. Same operator as q164 — the split IS a source-like
  // partition of the corpus.
  private def q167SplitLeakage(s: SparkSession, d: String): DataFrame =
    graft.operators.Datasheet.nearDupSourceMatrix(
      q19MinhashLsh(s, d).select(col("id_a"), col("id_b")),
      q87Splits(s, d).select(col("doc_id").as("id"),
        col("split").as("source")))
      .withColumnRenamed("src_a", "split_a")
      .withColumnRenamed("src_b", "split_b")

  private val q167Sql =
    s"""WITH pr AS (SELECT id_a, id_b FROM ($q19Sql)),
       |sp AS (SELECT doc_id, split FROM ($q87Sql)),
       |j AS (SELECT least(sa.split, sb.split) AS split_a,
       |    greatest(sa.split, sb.split) AS split_b
       |  FROM pr JOIN sp sa ON sa.doc_id = pr.id_a
       |          JOIN sp sb ON sb.doc_id = pr.id_b)
       |SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs
       |FROM j GROUP BY split_a, split_b""".stripMargin

  // ------------------- dedup-effective dataset size (§2.10 ext)
  // The datasheet scalar a dedup run is FOR: how many docs/tokens
  // actually remain when each near-dup cluster (q44's connected
  // components) keeps its representative. Doc and token keep rates in
  // one corpus-bounded aggregate over the id-keyed cluster table.
  private def q168EffectiveSize(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d).select(col("doc_id"),
      TextExprs.tokenCount(col("text")).cast("long").as("nt"))
    graft.operators.Datasheet.dedupEffectiveSize(q44DupClusters(s, d), tok)
  }

  private val q168Sql =
    s"""WITH cl AS (SELECT doc_id, cluster_rep FROM ($q44Sql)),
       |tok AS (SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt
       |  FROM documents)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT cluster_rep) AS BIGINT) AS n_clusters,
       |  round(CAST(count(DISTINCT cluster_rep) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS doc_keep_rate,
       |  CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN doc_id = cluster_rep THEN nt ELSE 0 END)
       |    AS BIGINT) AS rep_tokens,
       |  round(CAST(sum(CASE WHEN doc_id = cluster_rep THEN nt ELSE 0 END)
       |      AS DOUBLE) / CAST(sum(nt) AS DOUBLE), 6) AS token_keep_rate
       |FROM cl JOIN tok USING (doc_id)""".stripMargin

  // ------------------- OPQ-rotation ADC recall (§2.10 ext)
  // The recall arm for the LAST quantization family member without one:
  // q117's rotated-space PQ in the standard two-stage serving shape (ADC
  // shortlist → exact L2 re-rank, the q145 deployment pattern —
  // quantization costs recall only via shortlist misses), scored against
  // the exact L2 top-k in the ORIGINAL space (rotation preserves L2, so
  // the original-space ground truth is the right yardstick — a broken
  // rotation shows up as recall loss, not as a silently rotated
  // "truth"). Both arms are deterministic literals, so the oracle
  // replays rotation, codebook, codes, ADC shortlist, re-rank, and both
  // top-k's.
  private val q173Shortlist = 100

  private def q173OpqRecall(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val rot = embs.select(col("vec_id"),
      Similarity.rpProject(col("embedding").cast("array<double>"),
        q117Rotation).as("rvec"))
    val cb = graft.operators.Quantize.seedCodebook(rot, col("vec_id"),
      col("rvec"), pqSeedIds)
    val codes = graft.operators.Quantize.pqEncode(rot, col("vec_id"),
        col("rvec"), cb, pqM, pqDim)
      .drop("distortion")
    val qset = rot.filter(col("vec_id") < 5)
    val shortlist = graft.operators.Quantize.pqAdcTopK(codes, qset,
      "vec_id", "rvec", cb, pqM, pqDim, k = q173Shortlist)
    val ann = graft.operators.Quantize.rerankL2(shortlist, embs,
        embs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
      .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
    val exact = Similarity.bruteForceTopKL2(embs,
        embs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"))
    exact.join(ann,
        col("query_id") === col("aq") && col("neighbor_id") === col("an"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), count(col("an")).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        round(col("n_hit").cast("double") / col("k").cast("double"), 6)
          .as("recall"))
  }

  private val q173Sql = {
    val proj = q117Rotation.map(row =>
      "list_inner_product(v0, [" + row.map(_.toString).mkString(", ") + "])")
      .mkString("[", ",\n      ", "]")
    val mins = (0 until pqM).map { j =>
      "list_min([" + pqSeedIds.indices.map(c =>
        s"[${pqDistSql(j, s"cb$c")}, $c.0]").mkString(", ") + s"]) AS m$j"
    }.mkString(",\n    ")
    val codes = (0 until pqM).map(j => s"CAST(m$j[2] AS INTEGER) AS c$j")
      .mkString(", ")
    def qDist(j: Int, c: Int): String = {
      val lo = j * pqSub + 1
      val hi = lo + pqSub
      val diff = s"[q.qv[i] - cb$c.cv[i] for i in range($lo, $hi)]"
      s"list_inner_product($diff, $diff)"
    }
    val adc = (0 until pqM).map { j =>
      "(CASE " + pqSeedIds.indices.map(c =>
        s"WHEN p.c$j = $c THEN ${qDist(j, c)}").mkString(" ") + " END)"
    }.mkString(" + ")
    val cbJoins = pqSeedIds.indices.map(c => s" CROSS JOIN cb$c").mkString
    val d64 = "[qe.v0[i] - c.v0[i] for i in range(1, 65)]"
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0
       |            FROM embeddings),
       |e AS (SELECT vec_id, $proj AS v FROM e0),
       |$pqCbCtes,
       |p0 AS (
       |  SELECT e.vec_id,
       |    $mins
       |  FROM e$cbJoins),
       |p AS (SELECT vec_id, $codes FROM p0),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |sc AS (SELECT q.query_id, p.vec_id AS neighbor_id, $adc AS adc
       |  FROM p CROSS JOIN q$cbJoins WHERE q.query_id <> p.vec_id),
       |sl AS (SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY adc, neighbor_id) AS r FROM sc)
       |  WHERE r <= $q173Shortlist),
       |exd AS (SELECT qe.query_id, c.vec_id AS neighbor_id,
       |    list_inner_product($d64, $d64) AS d
       |  FROM e0 c CROSS JOIN
       |    (SELECT vec_id AS query_id, v0 FROM e0 WHERE vec_id < 5) qe
       |  WHERE qe.query_id <> c.vec_id),
       |ap AS (SELECT query_id AS aq, neighbor_id AS an FROM (
       |  SELECT exd.*, row_number() OVER (
       |    PARTITION BY exd.query_id ORDER BY d, exd.neighbor_id) AS r
       |  FROM exd JOIN sl ON exd.query_id = sl.query_id
       |    AND exd.neighbor_id = sl.neighbor_id)
       |  WHERE r <= 3),
       |ex AS (SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY d, neighbor_id) AS r FROM exd)
       |  WHERE r <= 3)
       |SELECT query_id, CAST(count(an) AS BIGINT) AS n_hit,
       |  round(CAST(count(an) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS recall
       |FROM ex LEFT JOIN ap ON query_id = aq AND neighbor_id = an
       |GROUP BY query_id""".stripMargin
  }

  // ------------------- perceptual image dedup (§2.10 ext)
  // The multimodal dedup arm: REAL PNGs (gradient fixtures, generated
  // executor-side) → real ImageIO decode → dHash perceptual fingerprint
  // → the same banded-Hamming pair machinery as the simhash family. The
  // oracle re-derives every decoded sample arithmetically (the encoder
  // is lossless and the gradient is an exact function of the id), packs
  // the same 64-bit signature (HUGEINT with an explicit two's-complement
  // wrap — bit 63 is live), replays the 4×16 banding, and verifies the
  // exact xor bit count — candidate cut included, no recall proxy.
  private val q178MaxHamming = 6

  /** Shared oracle tail for every perceptual-hash arm: a `bits(id, lo,
    * hi)` CTE (two 32-bit signature halves — bit 63 is live, so the
    * unsigned value is assembled in HUGEINT and wrapped to the signed
    * 64-bit Spark emits) → 4×16 banding → distinct band-collision
    * candidates → exact xor bit-count verify. Replays `NearDup
    * .hammingBandPairs` semantics verbatim, candidate cut included. */
  private val hammingSigCtes =
    s"""sg AS (SELECT id, CAST(hi AS HUGEINT) * 4294967296 + lo AS u
       |  FROM bits),
       |sig AS (SELECT id, u, CAST(CASE
       |    WHEN u >= CAST(9223372036854775808 AS HUGEINT)
       |    THEN u - CAST(18446744073709551616 AS HUGEINT) ELSE u END
       |    AS BIGINT) AS sig FROM sg),
       |banded AS (SELECT id, sig,
       |    b, CAST((u // (CASE b WHEN 0 THEN 1 WHEN 1 THEN 65536
       |      WHEN 2 THEN 4294967296 ELSE 281474976710656 END))
       |      % 65536 AS BIGINT) AS v
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b))""".stripMargin

  private def hammingTailSql(maxHamming: Int): String =
    s"""$hammingSigCtes,
       |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b,
       |    l.sig AS sa, r.sig AS sb
       |  FROM banded l JOIN banded r
       |    ON l.b = r.b AND l.v = r.v AND l.id < r.id)
       |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= $maxHamming""".stripMargin

  private def q178ImageDhash(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.embeddings(s, d).select(col("vec_id"))
    val media = graft.multimodal.MultimodalOps.gradientImages(ids)
    val sigs = graft.multimodal.MultimodalOps.dHashes(media).toDF()
    graft.operators.NearDup.hammingBandPairs(sigs,
        maxHamming = q178MaxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  private val q178BitsCtes =
    s"""pp AS (SELECT id, k % 23 + 9 AS w, k % 10 + 8 AS h,
       |    (k // 155 % 8) * 32 + (id % 3) * 2 AS base,
       |    (k // 31 % 5) * 32 + 16 AS sx, (k // 11 % 4) * 64 + 32 AS sy
       |  FROM (SELECT vec_id AS id,
       |      ((((vec_id % 4096) + 4096) % 4096) * 2654435761) % 4096 AS k FROM embeddings)),
       |grid AS (SELECT id, r, c,
       |    3 * ((base + sx * ((c * w) // 9) + sy * ((r * h) // 8)) % 256)
       |      AS s
       |  FROM pp CROSS JOIN (SELECT unnest(range(0, 8)) AS r)
       |    CROSS JOIN (SELECT unnest(range(0, 9)) AS c)),
       |-- bit 63 is live: build the unsigned signature in two 32-bit
       |-- halves, then wrap to the signed 64-bit Spark emits
       |bits AS (SELECT g1.id,
       |    CAST(sum(CASE WHEN g1.r * 8 + g1.c < 32 AND g1.s > g2.s
       |      THEN CAST(1 AS BIGINT) << (g1.r * 8 + g1.c) ELSE 0 END)
       |      AS BIGINT) AS lo,
       |    CAST(sum(CASE WHEN g1.r * 8 + g1.c >= 32 AND g1.s > g2.s
       |      THEN CAST(1 AS BIGINT) << (g1.r * 8 + g1.c - 32) ELSE 0 END)
       |      AS BIGINT) AS hi
       |  FROM grid g1 JOIN grid g2 ON g1.id = g2.id AND g1.r = g2.r
       |    AND g2.c = g1.c + 1
       |  GROUP BY g1.id)""".stripMargin

  private val q178Sql =
    s"""WITH $q178BitsCtes,
       |${hammingTailSql(q178MaxHamming)}""".stripMargin

  // ------------------- banded-Hamming recall QA (§2.10 ext)
  // q158's sampled-audit question for the perceptual family: above
  // radius 3 the 4x16 pigeonhole guarantee lapses, so the band cut's
  // recall at maxHamming=6 is MEASURED against an exact all-pairs
  // Hamming scan over a 1-in-5 id sample — the registered banded plan
  // restricted to the same sample is the candidate side.
  private val q185SampleMod = 5L

  private def q185DhashRecall(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.embeddings(s, d).select(col("vec_id"))
    val sigs = graft.multimodal.MultimodalOps.dHashes(
      graft.multimodal.MultimodalOps.gradientImages(ids)).toDF()
    graft.operators.NearDup.hammingBandQa(sigs,
      maxHamming = q178MaxHamming, sampleMod = q185SampleMod)
  }

  private val q185Sql =
    s"""WITH $q178BitsCtes,
       |$hammingSigCtes,
       |samp AS (SELECT id, sig FROM sig WHERE id % $q185SampleMod = 0),
       |truth AS (SELECT a.id AS ta, b.id AS tb FROM samp a JOIN samp b
       |  ON a.id < b.id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= $q178MaxHamming),
       |cand AS (SELECT DISTINCT l.id AS ca, r.id AS cb,
       |    l.sig AS sa, r.sig AS sb
       |  FROM banded l JOIN banded r
       |    ON l.b = r.b AND l.v = r.v AND l.id < r.id),
       |ver AS (SELECT ca, cb FROM cand
       |  WHERE bit_count(xor(sa, sb)) <= $q178MaxHamming
       |    AND ca % $q185SampleMod = 0 AND cb % $q185SampleMod = 0),
       |tj AS (SELECT t.ta, v.ca FROM truth t LEFT JOIN ver v
       |  ON t.ta = v.ca AND t.tb = v.cb)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM samp) AS n_sample,
       |  CAST(count(*) AS BIGINT) AS n_true_pairs,
       |  CAST(count(ca) AS BIGINT) AS n_caught,
       |  CASE WHEN count(*) > 0 THEN round(CAST(count(ca) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE), 6) END AS recall
       |FROM tj""".stripMargin

  // ------------------- CDC chunk dedup rate (§2.10 ext)
  // The scalar CDC chunking exists to produce: how much of the corpus
  // is repeated CHUNKS (shifted copies included), and the token volume
  // chunk-hash dedup would reclaim. The Spark side groups by the
  // 64-bit chunk hash (the q9 trade); the oracle groups by the chunk
  // TEXT, so a collision surfaces as a hash mismatch.
  private def q187CdcDedupRate(s: SparkSession, d: String): DataFrame = {
    val ch = graft.operators.Chunk.cdcChunks(Tables.documents(s, d),
      col("doc_id"), col("text"), q176Divisor, q176Remainder)
    ch.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("c"), min(col("n_tokens")).as("nt"))
      .agg(sum(col("c")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("nt")).as("total_tokens"),
        sum((col("c") - 1) * col("nt")).as("dup_tokens"))
      .select(col("n_chunks"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_chunks").cast("double"), 6).as("chunk_dup_rate"),
        col("total_tokens"), col("dup_tokens"),
        round(col("dup_tokens").cast("double") /
          col("total_tokens").cast("double"), 6).as("token_savings_rate"))
  }

  // lazy: q176Sql is declared later in the file — a strict val here
  // would capture null at object-init time
  private lazy val q187Sql =
    s"""WITH ch AS (SELECT * FROM ($q176Sql)),
       |g AS (SELECT chunk_text, CAST(count(*) AS BIGINT) AS c,
       |    CAST(min(n_tokens) AS BIGINT) AS nt
       |  FROM ch GROUP BY 1)
       |SELECT CAST(sum(c) AS BIGINT) AS n_chunks,
       |  CAST(count(*) AS BIGINT) AS n_distinct,
       |  round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
       |    AS chunk_dup_rate,
       |  CAST(sum(c * nt) AS BIGINT) AS total_tokens,
       |  CAST(sum((c - 1) * nt) AS BIGINT) AS dup_tokens,
       |  round(CAST(sum((c - 1) * nt) AS DOUBLE) /
       |    CAST(sum(c * nt) AS DOUBLE), 6) AS token_savings_rate
       |FROM g""".stripMargin

  // ------------------- per-source effective size (§2.10 ext)
  // q168 sliced: WHICH feed is dup-heavy — the per-source keep rates
  // that directly motivate the q183 dedup-aware mix.
  private def q188EffectiveBySource(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"),
      TextExprs.tokenCount(col("text")).cast("long").as("nt"))
    graft.operators.Datasheet.dedupEffectiveSizeBySource(
      q44DupClusters(s, d), tok,
      docs.select(col("doc_id"), col("source").as("src")))
  }

  private val q188Sql =
    s"""WITH cl AS (SELECT doc_id, cluster_rep FROM ($q44Sql)),
       |tok AS (SELECT doc_id, source AS src,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt
       |  FROM documents)
       |SELECT src, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT cluster_rep) AS BIGINT) AS n_clusters,
       |  round(CAST(count(DISTINCT cluster_rep) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS doc_keep_rate,
       |  CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN doc_id = cluster_rep THEN nt ELSE 0 END)
       |    AS BIGINT) AS rep_tokens,
       |  round(CAST(sum(CASE WHEN doc_id = cluster_rep THEN nt ELSE 0 END)
       |      AS DOUBLE) / CAST(sum(nt) AS DOUBLE), 6) AS token_keep_rate
       |FROM cl JOIN tok USING (doc_id)
       |GROUP BY src""".stripMargin

  // ------------------- RM3 pseudo-relevance feedback (§2.10 ext)
  // The query-expansion step of the lexical stack: retrieve, mine the
  // top feedback docs' term distribution (RM1), rescore with the
  // interpolated weighted query. Scores here are DATA-DRIVEN sums, so
  // the dsum discipline applies end to end: decimal feedback mass,
  // 1e-9-snapped RM1 terms and weighted contributions, exact-Long
  // ranking keys. Interpolation constants are embedded from the SAME
  // Scala doubles the operator uses (shortest-round-trip repr + CAST
  // AS DOUBLE), so both engines parse identical IEEE values.
  private val q189FbDocs = 3
  private val q189FbTerms = 5
  private val q189Alpha = 0.6
  private val q189K = 5

  private def q189Rm3(s: SparkSession, d: String): DataFrame =
    graft.operators.Bm25.rm3TopK(Tables.documents(s, d), col("doc_id"),
      col("text"), q68Queries, q68K1, q68B, q189FbDocs, q189FbTerms,
      q189Alpha, q189K)

  private val q189Sql = {
    val origRows = q68Queries.flatMap { case (qid, ts) =>
      val u = q189Alpha / ts.distinct.size
      ts.distinct.map(t => s"('$qid', '$t', CAST($u AS DOUBLE))")
    }.mkString(",\n      ")
    val oneMinusAlpha = (1.0 - q189Alpha).toString
    val k1p1 = (q68K1 + 1.0).toString
    val oneMinusB = (1.0 - q68B).toString
    val avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val idf = "ln(((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / " +
      "(CAST(df AS DOUBLE) + 0.5)) + 1.0)"
    val sat = s"((CAST(tf AS DOUBLE) * $k1p1) / (CAST(tf AS DOUBLE) + " +
      s"${q68K1} * ($oneMinusB + ${q68B} * (CAST(dl AS DOUBLE) / $avgdl))))"
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |fb AS (SELECT query_id, doc_id, score
       |  FROM (${bm25SqlFor(q68Queries, q68K1, q68B, q189FbDocs)})
       |  WHERE score > 0),
       |ft AS (SELECT query_id, sum(CAST(score AS DECIMAL(18,4))) AS tot
       |  FROM fb GROUP BY 1),
       |fbw AS (SELECT fb.query_id, fb.doc_id,
       |    score / CAST(tot AS DOUBLE) AS w_d
       |  FROM fb JOIN ft USING (query_id)),
       |fbtf AS (SELECT query_id, doc_id, w_d, dl, t,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT f.query_id, f.doc_id, f.w_d, len(k.ts) AS dl,
       |      unnest(k.ts) AS t
       |    FROM fbw f JOIN toks k ON f.doc_id = k.doc_id)
       |  GROUP BY 1, 2, 3, 4, 5),
       |rm1 AS (SELECT query_id, t, CAST(sum(CAST(round(
       |      w_d * CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE) * 1e9)
       |      AS BIGINT)) AS BIGINT) AS rm1_e9
       |  FROM fbtf GROUP BY 1, 2
       |  HAVING CAST(sum(CAST(round(w_d * CAST(tf AS DOUBLE) /
       |    CAST(dl AS DOUBLE) * 1e9) AS BIGINT)) AS BIGINT) > 0),
       |sel AS (SELECT query_id, t, rm1_e9 FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY rm1_e9 DESC, t) AS r FROM rm1)
       |  WHERE r <= $q189FbTerms),
       |st2 AS (SELECT query_id, CAST(sum(rm1_e9) AS BIGINT) AS sel_tot
       |  FROM sel GROUP BY 1),
       |expn AS (SELECT sel.query_id, t,
       |    CAST($oneMinusAlpha AS DOUBLE) * CAST(rm1_e9 AS DOUBLE) /
       |      CAST(sel_tot AS DOUBLE) AS w
       |  FROM sel JOIN st2 USING (query_id)),
       |orig AS (SELECT * FROM (VALUES
       |      $origRows) AS o(query_id, t, w)),
       |comb AS (SELECT query_id, t, CAST(sum(w) AS DOUBLE) AS w
       |  FROM (SELECT * FROM orig UNION ALL SELECT * FROM expn)
       |  GROUP BY 1, 2),
       |tset AS (SELECT DISTINCT t FROM comb),
       |dfx AS (SELECT t, CAST(count(*) AS BIGINT) AS df
       |  FROM (SELECT doc_id, unnest(list_distinct(ts)) AS t FROM toks)
       |  WHERE t IN (SELECT t FROM tset) GROUP BY 1),
       |st3 AS (SELECT count(*) AS n_docs,
       |    sum(CAST(len(ts) AS BIGINT)) AS sum_dl FROM toks),
       |tft AS (SELECT doc_id, dl, t, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS t FROM toks)
       |  WHERE t IN (SELECT t FROM tset) GROUP BY 1, 2, 3),
       |contrib AS (SELECT c.query_id, tft.doc_id, CAST(round(
       |      c.w * $idf * $sat * 1e9) AS BIGINT) AS e9
       |  FROM tft JOIN comb c USING (t) JOIN dfx USING (t)
       |    CROSS JOIN st3),
       |sc2 AS (SELECT query_id, doc_id,
       |    CAST(sum(e9) AS BIGINT) AS score_e9
       |  FROM contrib GROUP BY 1, 2)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
       |  round(CAST(score_e9 AS DOUBLE) / 1e9, 6) AS score
       |FROM (SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score_e9 DESC, doc_id) AS rank
       |  FROM sc2)
       |WHERE rank <= $q189K""".stripMargin
  }

  // ------------------- leakage-free split assignment (§2.10 ext)
  // The FIX for what q167 detects: hash-split on the near-dup CLUSTER
  // representative instead of the doc id, so near-copies land in the
  // same split by construction and the q167 leakage matrix is diagonal
  // — no post-hoc filtering, the assignment itself is leakage-free.
  // Composition of q44's clusters with q87's split law; the oracle
  // replays the CC and the mixed-hash split over cluster_rep.
  private def q186ClusterSplit(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.assignSplits(q44DupClusters(s, d),
        col("cluster_rep"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select(col("doc_id"), col("cluster_rep"), col("split"))

  private val q186Sql = {
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
  private def q183DedupAwareMix(s: SparkSession, d: String): DataFrame = {
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

  private val q183Sql =
    s"""WITH cl AS (SELECT doc_id, cluster_rep FROM ($q44Sql)),
       |dedup AS (SELECT d.doc_id, d.source, d.text FROM documents d
       |  JOIN cl ON d.doc_id = cl.doc_id
       |  WHERE cl.doc_id = cl.cluster_rep),
       |${temperatureMixCtes("dedup")}""".stripMargin

  // ------------------- per-source rank normalization (§2.10 ext)
  // Quantile normalization of quality scores: within-source percentile
  // makes thresholds comparable across sources with different score
  // scales. The Spark side builds the CDF on the distinct-(src, score)
  // count table (no per-source corpus sort — the low-cardinality window
  // skew trap); the oracle runs the textbook percent_rank() window, so
  // the hash match proves the decomposition.
  private def q182RankNormalize(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
    graft.operators.Classify.rankNormalize(docs, col("doc_id"),
        round(graft.functions.TextExprs.qualityScore(col("text")), 6),
        col("source"))
      .withColumnRenamed("id", "doc_id")
      .withColumnRenamed("grp", "src")
      .withColumnRenamed("score", "quality")
  }

  private val q182Sql =
    s"""WITH q AS (SELECT doc_id, source AS src, round(
       |    $qualitySqlBody,
       |    6) AS quality
       |  FROM documents
       |  WHERE length(trim(text)) > 0 AND source IS NOT NULL)
       |SELECT doc_id, src, quality,
       |  round(CAST(percent_rank() OVER (
       |    PARTITION BY src ORDER BY quality) AS DOUBLE), 6) AS pr
       |FROM q""".stripMargin

  // ------------------- streaming DoReMi reweighting (§2.10 ext)
  // q174's weights re-derived after every ingest batch from additive
  // (src, token) count state — the accumulated table equals the
  // one-shot table EXACTLY under any arrival split, so the streaming
  // read shares q174's oracle verbatim.
  private def q181StreamingDoremi(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("doremi_stream")
      .toString
    val docs = Tables.documents(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.DoremiStream.ingestBatch(s,
        docs.filter(col("doc_id") % 3 === b),
        col("text"), col("source"), state)
    }
    graft.streaming.DoremiStream.readWeights(s, state,
      eta = 1.0, smoothing = 0.2)
  }

  // ------------------- perceptual audio dedup (§2.10 ext)
  // The audio arm of the perceptual-dedup triple: REAL 16-bit PCM WAVs
  // → real javax.sound decode → 65-window envelope difference hash →
  // the shared banded-Hamming chain. The oracle re-derives every
  // decoded sample arithmetically (PCM is lossless), folds the SAME
  // floor-mean windows, and replays the q178 tail verbatim.
  private val q179MaxHamming = 6

  private def q179AudioEnvelope(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.embeddings(s, d).select(col("vec_id"))
    val media = graft.multimodal.MultimodalOps.toneAudio(ids)
    val sigs = graft.multimodal.MultimodalOps.envelopeHashes(media).toDF()
    graft.operators.NearDup.hammingBandPairs(sigs,
        maxHamming = q179MaxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  private val q179Sql =
    s"""WITH pp AS (SELECT id, k % 200 + 130 AS n, k // 7 % 97 + 11 AS step,
       |    (k // 11 % 50) * 40 + id % 3 AS base
       |  FROM (SELECT vec_id AS id,
       |      ((((vec_id % 4096) + 4096) % 4096) * 2654435761) % 4096 AS k FROM embeddings)),
       |wm AS (SELECT id, j,
       |    list_sum(list_transform(range(j * n // 65, (j + 1) * n // 65),
       |      i -> abs((base + i * step) % 2001 - 1000)))
       |      // ((j + 1) * n // 65 - j * n // 65) AS w
       |  FROM pp CROSS JOIN (SELECT unnest(range(0, 65)) AS j)),
       |bits AS (SELECT w1.id,
       |    CAST(sum(CASE WHEN w1.j < 32 AND w1.w > w2.w
       |      THEN CAST(1 AS BIGINT) << w1.j ELSE 0 END) AS BIGINT) AS lo,
       |    CAST(sum(CASE WHEN w1.j >= 32 AND w1.w > w2.w
       |      THEN CAST(1 AS BIGINT) << (w1.j - 32) ELSE 0 END)
       |      AS BIGINT) AS hi
       |  FROM wm w1 JOIN wm w2 ON w1.id = w2.id AND w2.j = w1.j + 1
       |  GROUP BY w1.id),
       |${hammingTailSql(q179MaxHamming)}""".stripMargin

  // ------------------- perceptual video dedup (§2.10 ext)
  // The video arm: REAL RIFF/AVI clips → real container parse → the
  // per-frame brightness curve resampled to 65 points → difference
  // hash → the shared chain. Solid frames make the parsed per-frame
  // mean EXACTLY the fill byte, so the oracle replays the whole curve.
  private val q180MaxHamming = 6

  private def q180VideoCurve(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.embeddings(s, d).select(col("vec_id"))
    val media = graft.multimodal.MultimodalOps.clipVideo(ids)
    val sigs = graft.multimodal.MultimodalOps.curveHashes(media).toDF()
    graft.operators.NearDup.hammingBandPairs(sigs,
        maxHamming = q180MaxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  private val q180Sql =
    s"""WITH pp AS (SELECT id, k % 30 + 35 AS nf,
       |    (k // 13 % 31) * 8 + 9 AS step,
       |    (k // 11 % 8) * 32 + id % 3 AS base
       |  FROM (SELECT vec_id AS id,
       |      ((((vec_id % 4096) + 4096) % 4096) * 2654435761) % 4096 AS k FROM embeddings)),
       |pt AS (SELECT id, j,
       |    (base + ((j * nf) // 65) * step) % 256 AS p
       |  FROM pp CROSS JOIN (SELECT unnest(range(0, 65)) AS j)),
       |bits AS (SELECT p1.id,
       |    CAST(sum(CASE WHEN p1.j < 32 AND p1.p > p2.p
       |      THEN CAST(1 AS BIGINT) << p1.j ELSE 0 END) AS BIGINT) AS lo,
       |    CAST(sum(CASE WHEN p1.j >= 32 AND p1.p > p2.p
       |      THEN CAST(1 AS BIGINT) << (p1.j - 32) ELSE 0 END)
       |      AS BIGINT) AS hi
       |  FROM pt p1 JOIN pt p2 ON p1.id = p2.id AND p2.j = p1.j + 1
       |  GROUP BY p1.id),
       |${hammingTailSql(q180MaxHamming)}""".stripMargin

  // ------------------- robust outlier panel (§2.10 ext)
  // Hampel filter per source on document token counts: median/MAD, not
  // mean/sigma, so the screen isn't dragged by what it hunts. Integer
  // token counts make every interpolated median, deviation, and
  // threshold product exact IEEE — the oracle's percentile_cont replays
  // Spark's exact percentile bit-for-bit.
  private val q177Z = 3.0

  private def q177RobustOutliers(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Datasheet.robustOutliers(docs,
      graft.functions.TextExprs.tokenCount(col("text")), col("source"),
      z = q177Z)
  }

  private val q177Sql =
    s"""WITH tok AS (SELECT source AS src, CAST(
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
       |    AS DOUBLE) AS v
       |  FROM documents WHERE source IS NOT NULL),
       |md AS (SELECT src, percentile_cont(0.5) WITHIN GROUP (ORDER BY v)
       |    AS med FROM tok GROUP BY 1),
       |dv AS (SELECT tok.src, v, med, abs(v - med) AS dev
       |  FROM tok JOIN md USING (src)),
       |md2 AS (SELECT src, percentile_cont(0.5) WITHIN GROUP (ORDER BY dev)
       |    AS mad FROM dv GROUP BY 1)
       |SELECT dv.src, CAST(count(*) AS BIGINT) AS n_docs,
       |  round(dv.med, 6) AS median_v, round(md2.mad, 6) AS mad_v,
       |  CAST(sum(CASE WHEN dev > $q177Z * greatest(md2.mad, 1e-9)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |  round(CAST(sum(CASE WHEN dev > $q177Z * greatest(md2.mad, 1e-9)
       |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS outlier_share
       |FROM dv JOIN md2 USING (src)
       |GROUP BY dv.src, dv.med, md2.mad""".stripMargin

  // ------------------- streaming robust outliers (§2.10 ext)
  // q177's median/MAD panel after every ingest batch from additive
  // (src, value) count state — median/MAD has no constant-size
  // sufficient statistic, so the value-count table IS the minimal
  // exact state; the read equals the one-shot panel bit for bit and
  // shares q177's oracle verbatim.
  private def q184StreamingOutliers(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("outlier_stream")
      .toString
    val docs = Tables.documents(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.OutlierStream.ingestBatch(s,
        docs.filter(col("doc_id") % 3 === b),
        graft.functions.TextExprs.tokenCount(col("text")), col("source"),
        state)
    }
    graft.streaming.OutlierStream.readPanel(s, state, z = q177Z)
  }

  // ------------------- content-defined chunking (§2.10 ext)
  // Rabin-style hash-cut chunking: boundaries follow content, so chunk
  // hashes survive shifted edits (the dedup-robust chunk grain). The
  // Spark side derives spans map-side from cut positions; the oracle
  // formulates the SAME partition as an exclusive prefix sum over cut
  // flags and re-derives every chunk hash from the chunk text itself —
  // a boundary or hash disagreement anywhere fails the row hash.
  private val q176Divisor = 16
  private val q176Remainder = 3

  private def q176CdcChunks(s: SparkSession, d: String): DataFrame =
    graft.operators.Chunk.cdcChunks(Tables.documents(s, d),
        col("doc_id"), col("text"), q176Divisor, q176Remainder)
      .withColumnRenamed("id", "doc_id")

  private val q176Sql = {
    val poly = (e: String) =>
      s"list_reduce(list_transform(string_split($e, ''), " +
        "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"
    s"""$q71TokensCte,
       |tk AS (SELECT doc_id, i, ts[i + 1] AS t
       |  FROM (SELECT doc_id, ts, unnest(range(0, len(ts))) AS i FROM toks)),
       |ck AS (SELECT doc_id, i, t,
       |    CASE WHEN (${poly("t")}) % $q176Divisor = $q176Remainder
       |      THEN 1 ELSE 0 END AS cut FROM tk),
       |cid AS (SELECT doc_id, i, t, CAST(coalesce(sum(cut) OVER (
       |      PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS INTEGER) AS chunk_idx
       |  FROM ck),
       |ch AS (SELECT doc_id, chunk_idx, CAST(count(*) AS INTEGER) AS n_tokens,
       |    string_agg(t, ' ' ORDER BY i) AS chunk_text
       |  FROM cid GROUP BY 1, 2)
       |SELECT doc_id, chunk_idx, n_tokens, chunk_text,
       |  ${poly("chunk_text")} AS chunk_hash
       |FROM ch""".stripMargin
  }

  // ------------------- PMI collocations (§2.10 ext)
  // Church-&-Hanks collocation mining: top pairs by how far above chance
  // they co-occur. The CANDIDATE ORDER is a pure integer-double ratio
  // (no transcendental in the sort key — a last-ulp ln() disagreement
  // between engines can't reorder ties); ln is applied only to the
  // rounded display column.
  private val q175K = 30
  private val q175MinCount = 5

  private def q175PmiCollocations(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.pmiCollocations(Tables.documents(s, d),
      col("text"), k = q175K, minCount = q175MinCount)

  private val q175Sql =
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

  // ------------------- DoReMi-lite domain reweighting (§2.10 ext)
  // One exponentiated-gradient step on per-source excess unigram loss:
  // sources the corpus-wide LM models badly (vocabulary far from the
  // mixture) gain weight over their raw token share. The oracle replays
  // the whole chain — smoothed distributions, the 1e-9-snapped log-ratio
  // terms, HUGEINT/decimal numerators, the 1e-12-snapped exp outputs —
  // so the hash match certifies the fixed-point discipline end to end.
  private def q174DoremiWeights(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.doremiReweight(Tables.documents(s, d),
      col("text"), col("source"), eta = 1.0, smoothing = 0.2)

  private val q174Sql =
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

  // ------------------- streaming novelty series (§2.10 ext)
  // q166's question per ingest batch: how much of each arriving batch is
  // content the accumulated corpus has never seen (novelty → 0 means the
  // feed is re-crawling itself). A gram is novel exactly once — in the
  // batch where it FIRST appears — so the oracle is a first-batch
  // attribution over the same deterministic id % 3 split.
  private def q169NoveltySeries(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("novel_stream")
      .toString
    val docs = Tables.documents(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.NovelGramStream.ingestBatch(s,
        docs.filter(col("doc_id") % 3 === b), col("text"), b.toLong, state)
    }
    graft.streaming.NovelGramStream.noveltySeries(s, state)
  }

  private val q169Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
      |  )) AS g FROM toks WHERE len(ts) > 0),
      |bg AS (SELECT DISTINCT doc_id % 3 AS b, g FROM sh),
      |first AS (SELECT g, min(b) AS fb FROM bg GROUP BY g)
      |SELECT b AS batch_id, CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(sum(CASE WHEN fb = b THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  round(CAST(sum(CASE WHEN fb = b THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS novelty_rate
      |FROM bg JOIN first USING (g)
      |GROUP BY b""".stripMargin

  // ------------------- streaming dup clusters (§2.10 ext)
  // Duplicate clusters maintained ONLINE: the incremental band-index
  // stream (q57's operator) discovers each near-dup pair exactly once,
  // when its later endpoint arrives, so after any arrival split the
  // accumulated pair sink EQUALS the batch pair set and the cluster
  // read — connected components over ids + sink — equals q44 exactly
  // (its oracle certifies this query). Per-poll cost tracks the BATCH
  // (band probe + verify); the cluster read costs O(accumulated pairs),
  // which is id-only METADATA, never corpus text — recomputing CC from
  // the pair sink is the honest scale shape until cluster counts make
  // an alias-log union-find state worth its compaction machinery.
  private def q170StreamingClusters(s: SparkSession, d: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("cluster_stream")
      .toString
    val docs = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text"))
    (0 until 3).foreach { b =>
      graft.streaming.NearDupStream.ingestBatch(s,
        docs.filter(col("id") % 3 === b),
        s"$base/state", s"$base/sink",
        n = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)
    }
    val edges = s.read.parquet(s"$base/sink")
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    graft.operators.DupClusters.connectedComponents(
        docs.select(col("id")), edges)
      .select(col("id").as("doc_id"), col("cluster_rep"))
  }

  // ------------------- prediction churn between filter versions (§2.10 ext)
  // The pre-rollout review artifact for a filter version bump: not "do
  // v1 and v2 agree" (q143's kappa) but WHAT v2 changes and WHERE —
  // directional flip counts per source at the production threshold. The
  // v2 model is a deterministic perturbation of q77's literals (a
  // zero-mean alternating ±0.6 weight nudge, 6-decimal snapped — exactly
  // representable, rendered into both plans), non-monotone vs v1 so both
  // flip directions occur (sf0.01: 31 enters / 5 exits — a bias-only or
  // scale-only "v2" is monotone in z and can never produce exits).
  private val q162WeightsB: Seq[Double] = q77Weights.zipWithIndex.map {
    case (w, i) =>
      math.rint((w + (if (i % 2 == 0) 0.6 else -0.6)) * 1e6) / 1e6
  }
  private val q162BiasB = q77Bias

  private def q162PredictionChurn(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val a = graft.operators.Classify.hashedLinearScore(docs, col("doc_id"),
      col("text"), q77Weights, q77Bias)
      .select(col("id"), (col("score") >= 0.5).as("ka"))
    val b = graft.operators.Classify.hashedLinearScore(docs, col("doc_id"),
      col("text"), q162WeightsB, q162BiasB)
      .select(col("id"), (col("score") >= 0.5).as("kb"))
    val joined = a.join(b, Seq("id"))
      .join(docs.select(col("doc_id").as("id"), col("source")), Seq("id"))
    graft.operators.Classify.predictionChurn(joined, col("ka"), col("kb"),
        col("source"))
      .withColumnRenamed("grp", "source")
  }

  private val q162Sql =
    s"""WITH sa AS (SELECT doc_id, score FROM (${linearScoreSql(q77Weights, q77Bias)})),
       |sb AS (SELECT doc_id, score FROM (${linearScoreSql(q162WeightsB, q162BiasB)})),
       |j AS (SELECT d.source, sa.score >= 0.5 AS a, sb.score >= 0.5 AS b
       |  FROM sa JOIN sb USING (doc_id) JOIN documents d USING (doc_id))
       |SELECT source, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_a,
       |  CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_b,
       |  CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_enter,
       |  CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exit,
       |  round(CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS churn_rate
       |FROM j GROUP BY source""".stripMargin

  // ------------------- streaming score drift (§2.10 ext)
  // q160's monitor in its real regime: the "current" snapshot arrives in
  // three micro-batches, each scored by the frozen filter and folded
  // into the (bin, n) histogram state — counts are additive, so the
  // accumulated histogram equals the one-shot binning EXACTLY and the
  // drift read against the reference histogram reproduces q160 verbatim
  // (its oracle certifies this query).
  private def q163StreamingScoreDrift(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("scoredrift_stream")
      .toString
    val docs = Tables.documents(s, d)
    def scored(df: DataFrame) = graft.operators.Classify.hashedLinearScore(
      df, col("doc_id"), col("text"), q77Weights, q77Bias)
    val newer = docs.filter(col("source") =!= "src3" &&
      !(col("source") === "src7" && col("doc_id") % 2 === 0))
    (0 until 3).foreach { b =>
      graft.streaming.ScoreDriftStream.ingestBatch(s,
        scored(newer.filter(col("doc_id") % 3 === b)),
        col("score"), state, q138Bins)
    }
    graft.streaming.ScoreDriftStream.driftVsReference(s, state,
      graft.operators.Classify.binCounts(scored(docs), col("score"),
        q138Bins))
  }

  // ------------------- embedding health panel (§2.10 ext)
  // The datasheet entry that catches a broken embedder before the
  // ANN/dedup family consumes it: ragged dims, zero-norm rows, collapsed
  // norm distribution. Per-row ‖v‖² is the shared sequential-IEEE dot;
  // the mean snaps rows to 1e-9 fixed point and sums in DECIMAL(38,0).
  private def q161EmbedHealth(s: SparkSession, d: String): DataFrame =
    graft.operators.Datasheet.embeddingHealth(Tables.embeddings(s, d),
      col("embedding"), col("label"))

  private val q161Sql =
    """WITH e AS (SELECT label,
      |    CAST(len(embedding) AS INTEGER) AS dims,
      |    list_inner_product(CAST(embedding AS DOUBLE[]),
      |      CAST(embedding AS DOUBLE[])) AS n2
      |  FROM embeddings)
      |SELECT label AS grp, CAST(count(*) AS BIGINT) AS n_vecs,
      |  min(dims) AS dim_min, max(dims) AS dim_max,
      |  CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  round(CAST(sum(CAST(round(n2 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
      |    / CAST(count(*) AS DOUBLE), 6) AS mean_norm2,
      |  round(min(n2), 6) AS min_norm2,
      |  round(max(n2), 6) AS max_norm2
      |FROM e GROUP BY label""".stripMargin

  // ------------------- streaming embedding health (§2.10 ext)
  // q161's panel in its real regime: encoder output arrives in batches,
  // folded into the raw mergeable aggregate (counts, min/max, decimal
  // fixed-point norm sum — all associative, so the accumulated state
  // equals the one-shot panel EXACTLY for any arrival split). q161's
  // oracle certifies this query verbatim.
  private def q172StreamingEmbedHealth(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("embhealth_stream")
      .toString
    val embs = Tables.embeddings(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.EmbedHealthStream.ingestBatch(s,
        embs.filter(col("vec_id") % 3 === b),
        col("embedding"), col("label"), state)
    }
    graft.streaming.EmbedHealthStream.health(s, state)
  }

  // ------------------- IVF nprobe operating curve (§2.10 ext)
  // q141's single-point recall check widened to the whole dial: recall@5
  // AND candidate volume per probe radius 0..3 for the q22 LSH IVF — the
  // curve that picks a serving operating point and catches recall rot
  // when the embedding distribution drifts. Micro-averaged integer
  // counts, one division per row; the oracle replays every arm.
  private val q159Radii = Seq(0, 1, 2, 3)

  private def q159ProbeSweep(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    Similarity.ivfProbeSweep(embs, embs.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, dim = 64, bits = q22Bits, seed = 42L,
      radii = q159Radii, exact = q21CosineTopK(s, d))
  }

  private val q159Sql = {
    val bucket = sqlBucket("v", VectorExprs.lshPlanes(64, q22Bits, 42L))
    val armCtes = q159Radii.map { r =>
      s"""cand$r AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    list_inner_product(q.qv, c.v) / (sqrt(q.qn2) * sqrt(c.n2)) AS c2
         |  FROM b c JOIN q
         |    ON bit_count(xor(CAST(c.bucket AS BIGINT), CAST(q.qb AS BIGINT))) <= $r
         |  WHERE q.query_id <> c.vec_id),
         |ap$r AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY c2 DESC, neighbor_id) AS rk
         |    FROM cand$r) WHERE rk <= 5),
         |m$r AS (SELECT
         |  (SELECT count(*) FROM ex) AS n_exact,
         |  (SELECT count(*) FROM ex t JOIN ap$r a
         |     ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id)
         |    AS n_hit,
         |  (SELECT count(*) FROM cand$r) AS n_cand)""".stripMargin
    }.mkString(",\n")
    val armSelects = q159Radii.map { r =>
      s"""SELECT $r AS probe_hamming, CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(n_hit AS BIGINT) AS n_hit,
         |  round(CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
         |    AS recall,
         |  CAST(n_cand AS BIGINT) AS n_cand FROM m$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucket AS bucket,
       |             list_inner_product(v, v) AS n2 FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb, n2 AS qn2
       |      FROM b WHERE vec_id < 10),
       |ex AS (SELECT query_id, neighbor_id FROM ($q21Sql)),
       |$armCtes
       |$armSelects""".stripMargin
  }

  // ------------------- blocker QA on a deterministic sample (§2.10 ext)
  // q41's blocker audited: pairs completeness + reduction ratio of the
  // char-8-gram candidate stage, with ground truth = bounded all-pairs
  // Levenshtein WITHIN the id % 7 sample (the only place all-pairs can
  // exist) and candidates = the production blocker's own df-cut postings
  // over the FULL corpus, restricted to sample pairs. Same parameters as
  // the registered q41. sampleMod is the boundedness knob: the all-pairs
  // ground truth is O((n/sampleMod)²) — the fixture uses mod 2 so the
  // handful of true ≤12-distance pairs actually lands in-sample (dup ids
  // are delta-correlated; mod 7 catches zero of the 25), a 100 TB
  // deployment sizes it so the sample stays ~10⁴–10⁵ docs.
  private val q158SampleMod = 2L

  private def q158BlockerQa(s: SparkSession, d: String): DataFrame =
    NearDup.blockerQa(Tables.documents(s, d), col("doc_id"), col("text"),
      prefixLen = 40, q = 8, maxDist = 12, maxPostings = 200,
      sampleMod = q158SampleMod)

  private val q158Sql =
    s"""WITH p AS (
       |  SELECT doc_id, substring(text, 1, 40) AS prefix FROM documents
       |  WHERE length(trim(substring(text, 1, 40))) > 0),
       |s AS (SELECT * FROM p WHERE doc_id % $q158SampleMod = 0),
       |truth AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM s a JOIN s b
       |  ON a.doc_id < b.doc_id
       |  WHERE levenshtein(a.prefix, b.prefix) <= 12),
       |g0 AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [substring(np, i, 8) for i in range(1, greatest(len(np) - 7, 1) + 1)]
       |  )) AS gram
       |  FROM (SELECT doc_id,
       |          regexp_replace(trim(prefix), '\\s+', ' ', 'g') AS np FROM p)),
       |g AS (
       |  SELECT doc_id, gram FROM (
       |    SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS df
       |    FROM g0) WHERE df <= 200),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |cs AS (SELECT * FROM cand
       |  WHERE id_a % $q158SampleMod = 0 AND id_b % $q158SampleMod = 0),
       |m AS (SELECT
       |  (SELECT count(*) FROM s) AS n_sample,
       |  (SELECT count(*) FROM truth) AS n_true,
       |  (SELECT count(*) FROM cs) AS n_cand,
       |  (SELECT count(*) FROM truth t JOIN cs c
       |     ON t.id_a = c.id_a AND t.id_b = c.id_b) AS n_caught)
       |SELECT CAST(n_sample AS BIGINT) AS n_sample,
       |  CAST(n_true AS BIGINT) AS n_true_pairs,
       |  CAST(n_cand AS BIGINT) AS n_cand_pairs,
       |  CAST(n_caught AS BIGINT) AS n_caught,
       |  CASE WHEN n_true > 0 THEN
       |    round(CAST(n_caught AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
       |  END AS pairs_completeness,
       |  CASE WHEN n_sample >= 2 THEN
       |    round(CAST(1 AS DOUBLE) - CAST(n_cand AS DOUBLE) /
       |      (CAST(n_sample AS DOUBLE) * CAST(n_sample - 1 AS DOUBLE)
       |        / CAST(2 AS DOUBLE)), 6)
       |  END AS reduction_ratio
       |FROM m""".stripMargin

  // ------------------- LSH candidate recall curve (§2.10 ext)
  // q141's recall-monitoring pattern applied to the DEDUP family: the
  // portable-permutation MinHash (4 bands × 4 rows — deliberately lossy,
  // S-curve 1-(1-j⁴)⁴ ≈ 0.88 at j=0.8) is scored against the exact
  // shingle-Jaccard ground truth (q18's own plan), per Jaccard tenth-
  // bucket. Both arms are deterministic modular arithmetic, so the oracle
  // replays the ENTIRE thing — exact pairs, minhash permutations, band
  // join — in SQL; a red row means the LSH family itself broke, not just
  // a fixture drift.
  private val q155Bands = 4
  private val q155Rows = 4

  private def q155LshRecall(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val exact = q18ShingleJaccard(s, d)
    val cand = NearDup.portableLshCandidates(docs, col("doc_id"),
      col("text"), n = 3, q155Bands, q155Rows)
    NearDup.lshRecallByBucket(exact, cand)
  }

  private val q155Sql =
    s"""WITH ex AS (SELECT id_a, id_b, jaccard FROM ($q18Sql)),
       |toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [array_to_string(ts[i:i+2], ' ') for i in range(1, greatest(len(ts)-3, 0) + 2)]
       |  )) AS shingle FROM toks WHERE len(ts) > 0),
       |ph AS (
       |  SELECT doc_id, list_reduce(
       |    list_transform(string_split(shingle, ''), c -> CAST(ascii(c) AS BIGINT)),
       |    (a, c) -> (a * 31 + c) % 1000000007) AS ph
       |  FROM sh),
       |hs AS (
       |  SELECT doc_id, i,
       |    min(((2 * i + 3) * ph + (101 * i + 7)) % 1000000007) AS mh
       |  FROM ph CROSS JOIN range(${q155Bands * q155Rows}) r(i)
       |  GROUP BY doc_id, i),
       |bk AS (
       |  SELECT doc_id, i // $q155Rows AS band,
       |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bucket
       |  FROM hs GROUP BY doc_id, i // $q155Rows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS ca, b.doc_id AS cb
       |  FROM bk a JOIN bk b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |SELECT round(floor(jaccard * 10) / 10, 1) AS j_bucket,
       |  CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(count(ca) AS BIGINT) AS n_caught,
       |  round(CAST(count(ca) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS recall
       |FROM ex LEFT JOIN cand ON id_a = ca AND id_b = cb
       |GROUP BY 1""".stripMargin

  // ------------------- SCD2 history build (§2.10 ext)
  // Change-event stream → validity intervals: the warehouse MERGE/SCD
  // type-2 pattern (no-op suppression, lead-closed intervals). Two
  // key-partitioned windows over ONE reused exchange; raw columns only,
  // so no float discipline needed.
  private def q190Scd2(s: SparkSession, d: String): DataFrame =
    graft.operators.Scd.scd2(Tables.events(s, d), Seq("user_id"),
      col("ts"), col("event_id"), col("event_type"), Seq(col("value")))

  private val q190Sql =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |ch AS (SELECT user_id, ts, event_id, event_type, value FROM ordered
      |       WHERE prev IS NULL OR event_type <> prev)
      |SELECT user_id, event_type AS version_value, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    AS is_current,
      |  value
      |FROM ch""".stripMargin

  // ------------------- ordered funnel conversion (§2.10 ext)
  // view → click → purchase with STRICT ordering (stage i+1 counts only
  // after the stage-i conversion instant). Stage filters push to the
  // scan; every join is on the entity key; rates are IEEE divisions of
  // exact longs.
  private val q191Stages = Seq("view", "click", "purchase")

  private def q191Funnel(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.funnel(Tables.events(s, d), col("user_id"),
      col("ts"), col("event_type"), q191Stages)

  private val q191Sql =
    """WITH s1 AS (SELECT user_id AS k, min(ts) AS t FROM events
      |  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1),
      |s2 AS (SELECT e.user_id AS k, min(e.ts) AS t FROM events e
      |  JOIN s1 ON e.user_id = s1.k AND e.ts > s1.t
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |s3 AS (SELECT e.user_id AS k, min(e.ts) AS t FROM events e
      |  JOIN s2 ON e.user_id = s2.k AND e.ts > s2.t
      |  WHERE e.event_type = 'purchase' GROUP BY 1),
      |c AS (
      |  SELECT 1 AS stage_idx, 'view' AS stage,
      |    (SELECT count(*) FROM s1) AS n_keys
      |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
      |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
      |  CAST(n_keys AS BIGINT) AS n_keys,
      |  round(CASE WHEN prev IS NULL THEN CAST(1.0 AS DOUBLE)
      |    WHEN prev = 0 THEN CAST(0.0 AS DOUBLE)
      |    ELSE CAST(n_keys AS DOUBLE) / CAST(prev AS DOUBLE) END, 6)
      |    AS conv_from_prev,
      |  round(CASE WHEN first_n = 0 THEN CAST(0.0 AS DOUBLE)
      |    ELSE CAST(n_keys AS DOUBLE) / CAST(first_n AS DOUBLE) END, 6)
      |    AS conv_from_first
      |FROM (SELECT *, lag(n_keys) OVER (ORDER BY stage_idx) AS prev,
      |    first_value(n_keys) OVER (ORDER BY stage_idx) AS first_n
      |  FROM c)""".stripMargin

  // ------------------- weekly cohort retention (§2.10 ext)
  // Cohort = ISO week of the key's first event; retained at offset w on
  // any activity in cohort-week + w. Two key-partitioned aggregations
  // meet in a key join; the output is a cohorts×offsets cell table and
  // cohort sizes re-join broadcast.
  private def q192Retention(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.weeklyRetention(Tables.events(s, d),
      col("user_id"), col("ts"))

  private val q192Sql =
    """WITH fw AS (SELECT user_id AS k,
      |    CAST(date_trunc('week', min(ts)) AS DATE) AS cw
      |  FROM events GROUP BY 1),
      |aw AS (SELECT DISTINCT user_id AS k,
      |    CAST(date_trunc('week', ts) AS DATE) AS aw FROM events),
      |cells AS (SELECT cw,
      |    CAST(date_diff('day', cw, aw) // 7 AS INTEGER) AS week_offset,
      |    CAST(count(*) AS BIGINT) AS n_active
      |  FROM aw JOIN fw USING (k) GROUP BY 1, 2),
      |sz AS (SELECT cw, n_active AS n_cohort FROM cells
      |  WHERE week_offset = 0)
      |SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week, week_offset,
      |  n_active,
      |  round(CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6)
      |    AS retention
      |FROM cells c JOIN sz ON c.cw = sz.cw""".stripMargin

  // ------------------- padding-overhead audit (§2.10 ext)
  // Padded-batch cost of hashed vs length-bucketed batching on the same
  // corpus — the audit that justifies bucketing WITHOUT a corpus sort.
  // Batch assignment is the oracle-portable LCG mix, so both engines
  // agree on every batch; all arithmetic is exact integers until the
  // final ratio.
  private val q193BatchRows = 32
  private val q193BucketWidth = 16

  private def q193PaddingOverhead(s: SparkSession, d: String): DataFrame =
    graft.operators.Pack.paddingOverhead(
      Tables.documents(s, d).select(col("doc_id"),
        size(graft.functions.TextExprs.tokens(col("text"))).as("nt")),
      col("doc_id"), col("nt"), q193BatchRows, q193BucketWidth)

  private val q193Sql =
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

  // ------------------- DSIR Gumbel top-k resampling (§2.10 ext)
  // The resampling step that turns q110's importance weights into an
  // actual selected subset: key = logw + Gumbel noise derived from the
  // doc's poly fingerprint (deterministic, RNG-free, oracle-replayable),
  // top-20 per source by the 1e-9-snapped key (exact-Long ranking).
  private val q194K = 20

  private def q194DsirResample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Dsir.gumbelTopK(
      raw = docs.filter(col("source") =!= "src0"),
      target = docs.filter(col("source") === "src0"),
      col("doc_id"), col("text"), col("source"),
      buckets = q110Buckets, k = q194K)
  }

  private val q194Sql =
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

  // ------------------- OOV rate under a min-frequency vocab (§2.10 ext)
  // Tokenizer-coverage audit: per source, the fraction of token
  // occurrences whose corpus-wide count is below the trainer's
  // min_frequency cut. Count-table composition only — no top-k vocab
  // ordering anywhere.
  private val q195MinCount = 5L

  private def q195OovRate(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.oovRateByGroup(Tables.documents(s, d),
      col("source"), col("text"), q195MinCount)

  private val q195Sql =
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

  // ------------------- windowed funnel (§2.10 ext)
  // q191's funnel with the conversion window every product funnel
  // actually uses: stage i+1 counts only within maxGap of the stage-i
  // instant. Gap test is epoch-microsecond long arithmetic on both
  // engines. 24h at fixture event density: 150 -> 60 -> 25.
  private val q196GapSeconds = 86400L

  private def q196FunnelWithin(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.funnelWithin(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_type"), q191Stages,
      q196GapSeconds)

  private val q196Sql = {
    val g = q196GapSeconds * 1000000L
    s"""WITH s1 AS (SELECT user_id AS k, min(ts) AS t FROM events
       |  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1),
       |s2 AS (SELECT e.user_id AS k, min(e.ts) AS t FROM events e
       |  JOIN s1 ON e.user_id = s1.k AND e.ts > s1.t
       |    AND epoch_us(e.ts) <= epoch_us(s1.t) + $g
       |  WHERE e.event_type = 'click' GROUP BY 1),
       |s3 AS (SELECT e.user_id AS k, min(e.ts) AS t FROM events e
       |  JOIN s2 ON e.user_id = s2.k AND e.ts > s2.t
       |    AND epoch_us(e.ts) <= epoch_us(s2.t) + $g
       |  WHERE e.event_type = 'purchase' GROUP BY 1),
       |c AS (
       |  SELECT 1 AS stage_idx, 'view' AS stage,
       |    (SELECT count(*) FROM s1) AS n_keys
       |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
       |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
       |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
       |  CAST(n_keys AS BIGINT) AS n_keys,
       |  round(CASE WHEN prev IS NULL THEN CAST(1.0 AS DOUBLE)
       |    WHEN prev = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE CAST(n_keys AS DOUBLE) / CAST(prev AS DOUBLE) END, 6)
       |    AS conv_from_prev,
       |  round(CASE WHEN first_n = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE CAST(n_keys AS DOUBLE) / CAST(first_n AS DOUBLE) END, 6)
       |    AS conv_from_first
       |FROM (SELECT *, lag(n_keys) OVER (ORDER BY stage_idx) AS prev,
       |    first_value(n_keys) OVER (ORDER BY stage_idx) AS first_n
       |  FROM c)""".stripMargin
  }

  // ------------------- query-likelihood Dirichlet retrieval (§2.10 ext)
  // The language-modeling member of the lexical trio (BM25 q68, RM3
  // q189): Dirichlet-smoothed unigram doc LMs scored by query
  // log-likelihood, plus one term absent from the whole collection to
  // pin the cf=0 drop. Same one-scan/one-stats-row/literal-chain
  // discipline as q68.
  private val q204Queries: Seq[(String, Seq[String])] = Seq(
    "narrow" -> Seq("spark", "window"),
    "mixed" -> Seq("customer", "fast", "join"),
    "oov" -> Seq("scan", "zzzunseen"))
  private val q204Mu = 500.0
  private val q204K = 5

  private def q204QlTopK(s: SparkSession, d: String): DataFrame =
    graft.operators.Bm25.qlTopK(Tables.documents(s, d), col("doc_id"),
      col("text"), q204Queries, q204Mu, q204K)

  private val q204Sql = {
    val terms = q204Queries.flatMap(_._2).distinct
    val cfIdx = terms.zipWithIndex.toMap
    val mu = q204Mu.toString
    val cfAggs = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CAST(len(list_filter(ts, x -> x = '$t')) AS BIGINT)) AS cf_$i"
    }.mkString(",\n      ")
    def contrib(t: String): String = {
      val cf = s"cf_${cfIdx(t)}"
      val tf = s"CAST(len(list_filter(ts, x -> x = '$t')) AS DOUBLE)"
      s"CASE WHEN $cf > 0 THEN ln(($tf + $mu * (CAST($cf AS DOUBLE) / " +
        s"CAST(sum_dl AS DOUBLE))) / (CAST(len(ts) AS DOUBLE) + $mu)) " +
        s"ELSE 0.0 END"
    }
    val scoreCols = q204Queries.zipWithIndex.map { case ((_, ts), i) =>
      ts.map(contrib).mkString(" + ") + s" AS s$i"
    }.mkString(",\n      ")
    val union = q204Queries.zipWithIndex.map { case ((qid, _), i) =>
      s"SELECT '$qid' AS query_id, doc_id, round(s$i, 4) AS score FROM sc"
    }.mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents),
       |st AS (SELECT sum(CAST(len(ts) AS BIGINT)) AS sum_dl,
       |      $cfAggs
       |    FROM toks),
       |sc AS (SELECT doc_id,
       |      $scoreCols
       |    FROM toks CROSS JOIN st),
       |u AS ($union),
       |r AS (SELECT query_id, doc_id, score, row_number() OVER (
       |        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |      FROM u)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score
       |FROM r WHERE rank <= $q204K""".stripMargin
  }

  // ------------------- streaming SCD2 (§2.10 ext)
  // q190's MERGE pattern run incrementally: three ts-ordered polls fold
  // into the version-table state; splits on the ts VALUE respect every
  // key's event order, so the accumulated table equals one-shot scd2
  // exactly and q203 shares q190's oracle verbatim.
  private def q203StreamingScd(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("scd_stream")
      .toString
    val ev = Tables.events(s, d).withColumn("tsu", unix_micros(col("ts")))
    val cuts = ev.stat.approxQuantile("tsu", Array(0.33, 0.66), 0.0)
    val batches = Seq(
      ev.where(col("tsu") < cuts(0)),
      ev.where(col("tsu") >= cuts(0) && col("tsu") < cuts(1)),
      ev.where(col("tsu") >= cuts(1)))
    batches.foreach { b =>
      graft.streaming.ScdStream.ingestBatch(s, b.drop("tsu"),
        Seq("user_id"), "ts", "event_id", "event_type", Seq("value"),
        state)
    }
    graft.streaming.ScdStream.readVersions(s, state, "event_id")
  }

  // ------------------- event transition matrix (§2.10 ext)
  // First-order Markov model of user journeys: per-key lag window over
  // one shuffle, types²-bounded counts, row-normalized probabilities.
  private def q202Transitions(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.transitionMatrix(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_id"), col("event_type"))

  private val q202Sql =
    """WITH pairs AS (SELECT event_type AS to_type,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM events),
      |cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t
      |  FROM cnt GROUP BY 1)
      |SELECT from_type, to_type, n,
      |  round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS p
      |FROM cnt JOIN tot USING (from_type)""".stripMargin

  // ------------------- session summary (§2.10 ext)
  // The engagement dashboard's one-row rollup over q43's session table:
  // bounce share, mean events/session, mean duration. Composes the
  // registered sessionization; oracle composes q43's oracle.
  private def q208SessionSummary(s: SparkSession, d: String): DataFrame =
    graft.operators.Sessionize.sessionSummary(Tables.events(s, d),
      Seq("user_id"), col("ts").cast("timestamp"), col("event_id"),
      gapSeconds = 3600L)

  private val q208Sql =
    s"""WITH sess AS ($q43Sql)
       |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bounce,
       |  round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS bounce_rate,
       |  round(CAST(sum(n_events) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS mean_events,
       |  round(CAST(sum(duration_s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS mean_duration_s
       |FROM sess""".stripMargin

  // ------------------- streaming Zipf slope (§2.10 ext)
  // q205 read live off the SAME (grp, token) count state q199 keeps —
  // one sufficient statistic serving both the coverage and the
  // corpus-health monitor; shares q205's oracle verbatim.
  private def q209StreamingZipf(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("zipf_stream")
      .toString
    val docs = Tables.documents(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.OovStream.ingestBatch(s,
        docs.filter(col("doc_id") % 3 === b),
        col("source"), col("text"), state)
    }
    graft.streaming.OovStream.readZipf(s, state)
  }

  // ------------------- vocab concentration panel (§2.10 ext)
  // Per-source corpus-health numbers beside the Zipf slope: hapax
  // share, ties-inclusive top-10 token mass, Gini of the count
  // distribution. Everything past the count shuffle runs on the
  // (grp, cnt) distinct-frequency table; Gini's rank-weighted sum is
  // division-free decimal integer arithmetic.
  private def q210Concentration(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.concentrationByGroup(Tables.documents(s, d),
      col("source"), col("text"))

  private val q210Sql =
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
  private def q211HeapsFit(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.heapsFitByGroup(Tables.documents(s, d),
      col("source"), col("text"))

  private val q211Sql = olsSqlOver(
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

  // ------------------- streaming vocab concentration (§2.10 ext)
  // q210 read live off the SAME (grp, token) count state q199/q209
  // keep — the third monitor served by one sufficient statistic; the
  // additive state equals the one-shot table exactly under any arrival
  // split, so q212 shares q210's oracle verbatim.
  private def q212StreamingConcentration(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("conc_stream")
      .toString
    val docs = Tables.documents(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.OovStream.ingestBatch(s,
        docs.filter(col("doc_id") % 3 === b),
        col("source"), col("text"), state)
    }
    graft.streaming.OovStream.readConcentration(s, state)
  }

  // ------------------- unigram entropy / effective vocab (§2.10 ext)
  // The concentration panel's information-theoretic sibling: H and
  // exp(H) per source off the same count table; the Σ cnt·ln(cnt) runs
  // on the distinct-frequency table with snapped lns in decimal.
  private def q219Entropy(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.entropyByGroup(Tables.documents(s, d),
      col("source"), col("text"))

  private val q219Sql =
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

  // ------------------- categorical balance, chi-square (§2.10 ext)
  // Stratification QA: per source, Pearson's chi² of its language
  // composition vs the corpus-wide one. Missing categories pay their
  // full expected mass; cell terms snap to 1e-6 into a decimal sum.
  private def q220CategoricalBalance(s: SparkSession, d: String)
      : DataFrame =
    graft.operators.Datasheet.categoricalBalance(Tables.documents(s, d),
      col("source"), col("lang"))

  private val q220Sql =
    """WITH cnt AS (SELECT source AS src, lang AS cat,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
      |ctt AS (SELECT cat, CAST(sum(o) AS BIGINT) AS ct
      |  FROM cnt GROUP BY 1),
      |stt AS (SELECT src, CAST(sum(o) AS BIGINT) AS st
      |  FROM cnt GROUP BY 1),
      |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cnt),
      |grid AS (SELECT s.src, c.cat, s.st, c.ct,
      |    COALESCE(cnt.o, 0) AS o, nn.n
      |  FROM stt s CROSS JOIN ctt c
      |  LEFT JOIN cnt ON cnt.src = s.src AND cnt.cat = c.cat
      |  CROSS JOIN nn),
      |t AS (SELECT src, st, CAST(round(
      |    (CAST(o AS DOUBLE) - CAST(st AS DOUBLE) * CAST(ct AS DOUBLE)
      |       / CAST(n AS DOUBLE)) *
      |    (CAST(o AS DOUBLE) - CAST(st AS DOUBLE) * CAST(ct AS DOUBLE)
      |       / CAST(n AS DOUBLE)) /
      |    (CAST(st AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |    * 1e6) AS HUGEINT) AS t6
      |  FROM grid)
      |SELECT src, max(st) AS n_docs, CAST(count(*) AS BIGINT) AS n_cats,
      |  round(CAST(sum(t6) AS DOUBLE) / 1e6, 6) AS chi2
      |FROM t GROUP BY src""".stripMargin

  // ------------------- streaming source affinity (§2.10 ext)
  // q216 in its ingest regime: the per-source wide state (n, smax,
  // component sums) is associative, so the accumulated state equals the
  // one-shot raw table exactly — q221 shares q216's oracle verbatim.
  private def q221StreamingAffinity(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("aff_stream")
      .toString
    val embs = Tables.embeddings(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.AffinityStream.ingestBatch(s,
        embs.filter(col("vec_id") % 3 === b),
        col("embedding"), col("label"), dims = 64, state)
    }
    graft.streaming.AffinityStream.readAffinity(s, dims = 64, state)
  }

  // ------------------- dup cluster-size histogram (§2.10 ext)
  // The duplication dashboard's shape panel over q44's labeling: a fat
  // tail means a boilerplate shingle glued unrelated docs. Composes the
  // registered clusters; the oracle composes q44's recursive CTE.
  private def q222ClusterSizes(s: SparkSession, d: String): DataFrame =
    graft.operators.DupClusters.sizeHistogram(q44DupClusters(s, d))

  private val q222Sql =
    s"""WITH lab AS ($q44Sql),
       |cs AS (SELECT cluster_rep, CAST(count(*) AS BIGINT) AS sz
       |       FROM lab GROUP BY 1)
       |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sz * count(*) AS BIGINT) AS n_docs
       |FROM cs GROUP BY sz""".stripMargin

  // ------------------- column profile (§2.10 ext)
  // The Deequ-style schema-health panel: per column, exact null rate,
  // exact distinct count, min/max — one scan (Expand-planned
  // multi-distinct), one metadata explode.
  private val q223Cols = Seq("doc_id", "lang", "source", "n_chars")

  private def q223ColumnProfile(s: SparkSession, d: String): DataFrame =
    graft.operators.Datasheet.columnProfile(Tables.documents(s, d),
      q223Cols)

  private val q223Sql = {
    val aggs = q223Cols.zipWithIndex.map { case (c, i) =>
      s"CAST(count($c) AS BIGINT) AS np$i, " +
        s"CAST(count(DISTINCT $c) AS BIGINT) AS nd$i,\n" +
        s"    CAST(min($c) AS VARCHAR) AS mn$i, " +
        s"CAST(max($c) AS VARCHAR) AS mx$i"
    }.mkString(",\n    ")
    val rows = q223Cols.zipWithIndex.map { case (c, i) =>
      s"""SELECT '$c' AS "column", n_rows, n_rows - np$i AS n_null,
         |  round(CAST(n_rows - np$i AS DOUBLE) /
         |    CAST(n_rows AS DOUBLE), 6) AS null_rate,
         |  nd$i AS n_distinct, mn$i AS min_value, mx$i AS max_value
         |FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |    $aggs
       |  FROM documents)
       |$rows""".stripMargin
  }

  // ------------------- normalized-dedup groups (§2.10 ext)
  // The dedup rung between byte-exact and MinHash: case / NFC / punct /
  // whitespace differences collapse; n_raw_variants separates re-render
  // groups from template spam. Empty normalized keys are excluded.
  private def q224NormalizedDups(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.normalizedDupGroups(Tables.documents(s, d),
      col("doc_id"), col("text"))

  private val q224Sql =
    """WITH n AS (SELECT doc_id, text,
      |    trim(regexp_replace(
      |      regexp_replace(trim(regexp_replace(regexp_replace(
      |        lower(nfc_normalize(text)), '[[:cntrl:]]', ' ', 'g'),
      |        '\s+', ' ', 'g')), '[^a-z0-9 ]', '', 'g'),
      |      '\s+', ' ', 'g')) AS k
      |  FROM documents)
      |SELECT min(doc_id) AS group_rep,
      |  CAST(count(*) AS BIGINT) AS n_members,
      |  CAST(count(DISTINCT text) AS BIGINT) AS n_raw_variants
      |FROM n WHERE length(k) > 0
      |GROUP BY k HAVING count(*) >= 2""".stripMargin

  // ------------------- streaming categorical balance (§2.10 ext)
  // q220 per ingest batch: the (src, cat) count state is additive, so
  // the accumulated table equals the one-shot exactly — q225 shares
  // q220's oracle verbatim.
  private def q225StreamingBalance(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("bal_stream")
      .toString
    val docs = Tables.documents(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.BalanceStream.ingestBatch(s,
        docs.filter(col("doc_id") % 3 === b),
        col("source"), col("lang"), state)
    }
    graft.streaming.BalanceStream.readBalance(s, state)
  }

  // ------------------- rebalance to target shares (§2.10 ext)
  // Post-stratification: the largest subset matching target language
  // shares (T = min n_c/t_c; limiting category kept whole), hash-keep
  // decisions replayed row-for-row by the oracle. Shares are powers of
  // two so the normalized literals are exact in both engines.
  private val q226Targets = Seq("en" -> 0.25, "fr" -> 0.25,
    "de" -> 0.25, "es" -> 0.125, "zh" -> 0.125)
  private val q226Scale = 1000000

  private def q226Rebalance(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.rebalanceToTarget(Tables.documents(s, d),
      col("doc_id"), col("lang"), q226Targets, q226Scale)

  private val q226Sql = {
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

  // ------------------- DAU / rolling WAU (§2.10 ext)
  // Exact distinct actives per day and per trailing 7-day window: the
  // corpus collapses to the (key, day) grain once; the rolling count
  // explodes that metadata to the windows each pair serves.
  private def q227ActiveUsers(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.activeUsers(Tables.events(s, d),
      col("user_id"), col("ts"), windowDays = 7)

  private val q227Sql =
    """WITH ud AS (SELECT DISTINCT user_id AS k,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |dau AS (SELECT dd, CAST(count(*) AS BIGINT) AS dau
      |        FROM ud GROUP BY 1),
      |w AS (SELECT DISTINCT k, dd + t.x AS wd FROM ud CROSS JOIN
      |        (SELECT unnest(generate_series(0, 6)) AS x) t),
      |wau AS (SELECT wd, CAST(count(*) AS BIGINT) AS wau
      |        FROM w GROUP BY 1)
      |SELECT DATE '1970-01-01' + CAST(dd AS INTEGER) AS day,
      |  dau.dau, wau.wau
      |FROM dau JOIN wau ON wau.wd = dau.dd""".stripMargin

  // ------------------- language-ID confusion matrix (§2.10 ext)
  // Declared lang vs the n-gram guess (q16), as the confusion matrix +
  // per-declared-lang share: the data-quality check on the lang column
  // itself. Pure composition: two count aggregates over q16's output.
  private def q228LangConfusion(s: SparkSession, d: String): DataFrame = {
    val g = q16LangId(s, d)
    val c = g.groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy(col("lang")).agg(sum(col("n")).as("tot"))
    c.join(broadcast(t), Seq("lang"))
      .select(col("lang"), col("lang_guess"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("share"))
  }

  private val q228Sql =
    s"""WITH g AS ($q16Sql),
       |c AS (SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
       |      FROM g GROUP BY 1, 2),
       |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot
       |      FROM c GROUP BY 1)
       |SELECT c.lang, c.lang_guess, c.n,
       |  round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
       |FROM c JOIN t USING (lang)""".stripMargin

  // ------------------- event-volume anomaly panel (§2.10 ext)
  // Per-type daily counts vs the type's own history: spike when
  // |n - mean| > z·σ, stats from exact decimal sums over the
  // types×days count table.
  private val q229Z = 2.0

  private def q229VolumeAnomaly(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.volumeAnomaly(Tables.events(s, d),
      col("event_type"), col("ts"), q229Z)

  private val q229Sql =
    s"""WITH cnt AS (SELECT event_type AS t,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
       |  GROUP BY 1, 2),
       |st AS (SELECT t, CAST(count(*) AS BIGINT) AS d,
       |    CAST(sum(CAST(n AS HUGEINT)) AS HUGEINT) AS s1,
       |    CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2
       |  FROM cnt GROUP BY 1),
       |x AS (SELECT cnt.t, cnt.dd, cnt.n, st.d,
       |    (CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE)) /
       |      CAST(greatest(d - 1, 1) AS DOUBLE) AS mean,
       |    sqrt(greatest((CAST(s2 AS DOUBLE) -
       |        CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) /
       |        CAST(greatest(d - 1, 1) AS DOUBLE) -
       |      ((CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE)) /
       |        CAST(greatest(d - 1, 1) AS DOUBLE)) *
       |      ((CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE)) /
       |        CAST(greatest(d - 1, 1) AS DOUBLE)), 0.0)) AS sd,
       |    (CAST(d - 1 AS HUGEINT) *
       |       (s2 - CAST(n AS HUGEINT) * n) =
       |     (s1 - n) * (s1 - n)) AS is_const
       |  FROM cnt JOIN st USING (t))
       |SELECT t AS event_type,
       |  DATE '1970-01-01' + CAST(dd AS INTEGER) AS day, n,
       |  CASE WHEN d = 1 OR is_const OR sd = 0.0 THEN NULL
       |    ELSE round((CAST(n AS DOUBLE) - mean) / sd, 4) END AS dev,
       |  CASE WHEN d = 1 THEN FALSE
       |    WHEN is_const OR sd = 0.0
       |      THEN abs(CAST(n AS DOUBLE) - mean) > 0.0
       |    ELSE abs(CAST(n AS DOUBLE) - mean) > sd * $q229Z END
       |    AS is_spike
       |FROM x""".stripMargin

  // ------------------- streaming DAU/WAU (§2.10 ext)
  // q227 per ingest poll: the distinct (key, day) grain merges by
  // union-distinct (idempotent — duplicate deliveries fold away), so
  // the accumulated grain equals one-shot exactly and q230 shares
  // q227's oracle verbatim.
  private def q230StreamingActive(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("act_stream")
      .toString
    val ev = Tables.events(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.ActiveStream.ingestBatch(s,
        ev.filter(col("event_id") % 3 === b),
        col("user_id"), col("event_type"), col("ts"), state)
    }
    graft.streaming.ActiveStream.readActive(s, windowDays = 7, state)
  }

  // ------------------- session association rules (§2.10 ext)
  // Market-basket on the session grain: support / confidence / lift per
  // ordered event-type pair — the empirical check on a funnel's assumed
  // stage order. One session window, then types²-bounded rule rows.
  private def q231AssociationRules(s: SparkSession, d: String)
      : DataFrame =
    graft.operators.Sessionize.associationRules(Tables.events(s, d),
      Seq("user_id"), col("ts").cast("timestamp"), col("event_id"),
      col("event_type"), gapSeconds = 3600L)

  private val q231Sql =
    """WITH b AS (SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_ms(ts) // 1000 -
      |            epoch_ms(lag(ts) OVER w) // 1000 > 3600
      |         THEN 1 ELSE 0 END AS nb
      |  FROM events WHERE user_id IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, event_type,
      |    CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sidx
      |  FROM b),
      |items AS (SELECT DISTINCT user_id, sidx, event_type AS t
      |  FROM s WHERE event_type IS NOT NULL),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS s FROM
      |  (SELECT DISTINCT user_id, sidx FROM items)),
      |singles AS (SELECT t, CAST(count(*) AS BIGINT) AS n1
      |  FROM items GROUP BY 1),
      |pairs AS (SELECT a.t AS ta, b2.t AS tb,
      |    CAST(count(*) AS BIGINT) AS n_both
      |  FROM items a JOIN items b2
      |    ON a.user_id = b2.user_id AND a.sidx = b2.sidx AND a.t < b2.t
      |  GROUP BY 1, 2),
      |r AS (SELECT ta AS lhs, tb AS rhs, n_both FROM pairs
      |      UNION ALL SELECT tb, ta, n_both FROM pairs)
      |SELECT lhs, rhs, n_both,
      |  round(CAST(n_both AS DOUBLE) / CAST(tot.s AS DOUBLE), 6)
      |    AS support,
      |  round(CAST(n_both AS DOUBLE) / CAST(nl.n1 AS DOUBLE), 6)
      |    AS confidence,
      |  round((CAST(n_both AS DOUBLE) * CAST(tot.s AS DOUBLE)) /
      |    (CAST(nl.n1 AS DOUBLE) * CAST(nr.n1 AS DOUBLE)), 6) AS lift
      |FROM r JOIN singles nl ON r.lhs = nl.t
      |  JOIN singles nr ON r.rhs = nr.t CROSS JOIN tot""".stripMargin

  // ------------------- inter-arrival cadence panel (§2.10 ext)
  // Per event type, exact median/p90 of same-user consecutive-event
  // gaps (attributed to the later event's type): the measured number a
  // session gap or poll budget is tuned against. Frequency-weighted
  // exact percentiles over the (type, gap) count table.
  private def q232InterArrival(s: SparkSession, d: String): DataFrame =
    graft.operators.Sessionize.interArrival(Tables.events(s, d),
      Seq("user_id"), col("ts").cast("timestamp"), col("event_id"),
      col("event_type"))

  private val q232Sql =
    """WITH g AS (SELECT event_type AS t,
      |    CAST(epoch_ms(ts) // 1000 - epoch_ms(lag(ts) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id)) // 1000
      |      AS DOUBLE) AS gap
      |  FROM events WHERE user_id IS NOT NULL),
      |f AS (SELECT t, gap FROM g
      |      WHERE t IS NOT NULL AND gap IS NOT NULL)
      |SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap), 6)
      |    AS median_gap_s,
      |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap), 6)
      |    AS p90_gap_s
      |FROM f GROUP BY 1""".stripMargin

  // ------------------- streaming volume anomaly (§2.10 ext)
  // q229 per ingest poll: the (type, day) count state is additive, so
  // the accumulated table equals one-shot exactly and q233 shares
  // q229's oracle verbatim.
  private def q233StreamingVolume(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("vol_stream")
      .toString
    val ev = Tables.events(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.ActiveStream.ingestBatch(s,
        ev.filter(col("event_id") % 3 === b),
        col("user_id"), col("event_type"), col("ts"), state)
    }
    graft.streaming.ActiveStream.readVolume(s, q229Z, state)
  }

  // ------------------- streaming grouped jackknife (§2.10 ext)
  // q234 per ingest batch: the (grp, n_g, d_g) decimal-sum state is
  // additive, so the accumulated table equals one-shot exactly and
  // q238 shares q234's oracle verbatim.
  private def q238StreamingJackknife(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("jack_stream")
      .toString
    val docs = Tables.documents(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.JackknifeStream.ingestBatch(s,
        docs.filter(col("doc_id") % 3 === b), col("source"),
        graft.functions.TextExprs.tokenCount(col("text")), lit(1L),
        state)
    }
    graft.streaming.JackknifeStream.readSummary(s, state)
  }

  // ------------------- A/B two-proportion z-test (§2.10 ext)
  // Hash-split buckets (portable mixedHash mod 2 — the oracle replays
  // every assignment), conversion = key purchased at least once,
  // pooled-SE z. One key-grain aggregate, metadata finish.
  private def q236AbTest(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.abTest(Tables.events(s, d), col("user_id"),
      col("event_type"), "purchase")

  private val q23xUserPoly = "list_reduce(list_transform(" +
    "string_split(CAST(k AS VARCHAR), ''), " +
    "c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 1000000007)"

  private val q236Sql =
    s"""WITH pk AS (SELECT user_id AS k,
       |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS conv
       |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
       |bk AS (SELECT (((($q23xUserPoly * 1103515245 + 12345) %
       |    1000000007) * 2654435761) % 1000000007) % 2 AS b, conv
       |  FROM pk),
       |a AS (SELECT
       |    CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN b = 0 THEN conv ELSE 0 END) AS BIGINT)
       |      AS conv_a,
       |    CAST(sum(CASE WHEN b = 1 THEN conv ELSE 0 END) AS BIGINT)
       |      AS conv_b
       |  FROM bk),
       |x AS (SELECT n_a, n_b, conv_a, conv_b,
       |    CAST(conv_a AS DOUBLE) /
       |      CAST(greatest(n_a, 1) AS DOUBLE) AS pa,
       |    CAST(conv_b AS DOUBLE) /
       |      CAST(greatest(n_b, 1) AS DOUBLE) AS pb,
       |    CAST(conv_a + conv_b AS DOUBLE) /
       |      CAST(greatest(n_a + n_b, 1) AS DOUBLE) AS pool
       |  FROM a),
       |y AS (SELECT *, sqrt(pool * (1.0 - pool) *
       |    (1.0 / CAST(greatest(n_a, 1) AS DOUBLE) +
       |     1.0 / CAST(greatest(n_b, 1) AS DOUBLE))) AS se
       |  FROM x)
       |SELECT n_a, n_b, conv_a, conv_b,
       |  CASE WHEN n_a = 0 THEN NULL ELSE round(pa, 6) END AS rate_a,
       |  CASE WHEN n_b = 0 THEN NULL ELSE round(pb, 6) END AS rate_b,
       |  CASE WHEN n_a = 0 OR n_b = 0 OR pool = 0.0 OR pool = 1.0
       |    THEN NULL ELSE round((pa - pb) / se, 4) END AS z,
       |  CASE WHEN n_a = 0 OR n_b = 0 OR pool = 0.0 OR pool = 1.0
       |    THEN FALSE ELSE abs((pa - pb) / se) > 1.96 END AS significant
       |FROM y""".stripMargin

  // ------------------- A/B split funnel (§2.10 ext)
  // The funnel per experiment bucket (same hash assignment as q236):
  // which STAGE the experiment moved. Two scan-pushed funnel passes.
  private def q237SplitFunnel(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.funnelBySplit(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_type"), q191Stages)

  private val q237Sql = {
    val bExpr = s"(((($q23xUserPoly * 1103515245 + 12345) % " +
      "1000000007) * 2654435761) % 1000000007) % 2"
    val perBucket = (0 to 1).map { b =>
      s"""e$b AS (SELECT user_id AS k, ts, event_type FROM events
         |  WHERE user_id IS NOT NULL AND $bExpr = $b),
         |s1_$b AS (SELECT k, min(ts) AS t FROM e$b
         |  WHERE event_type = 'view' GROUP BY 1),
         |s2_$b AS (SELECT e.k, min(e.ts) AS t FROM e$b e
         |  JOIN s1_$b s ON e.k = s.k AND e.ts > s.t
         |  WHERE e.event_type = 'click' GROUP BY 1),
         |s3_$b AS (SELECT e.k, min(e.ts) AS t FROM e$b e
         |  JOIN s2_$b s ON e.k = s.k AND e.ts > s.t
         |  WHERE e.event_type = 'purchase' GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val rows = (0 to 1).flatMap { b =>
      Seq(s"SELECT $b AS bucket, 1 AS stage_idx, 'view' AS stage, " +
        s"(SELECT count(*) FROM s1_$b) AS n_keys",
        s"SELECT $b, 2, 'click', (SELECT count(*) FROM s2_$b)",
        s"SELECT $b, 3, 'purchase', (SELECT count(*) FROM s3_$b)")
    }.mkString(" UNION ALL ")
    s"""WITH $perBucket,
       |c AS ($rows)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST(stage_idx AS INTEGER) AS stage_idx, stage,
       |  CAST(n_keys AS BIGINT) AS n_keys,
       |  round(CASE WHEN prev IS NULL THEN CAST(1.0 AS DOUBLE)
       |    WHEN prev = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE CAST(n_keys AS DOUBLE) / CAST(prev AS DOUBLE) END, 6)
       |    AS conv_from_prev,
       |  round(CASE WHEN first_n = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE CAST(n_keys AS DOUBLE) / CAST(first_n AS DOUBLE) END, 6)
       |    AS conv_from_first
       |FROM (SELECT *,
       |    lag(n_keys) OVER (PARTITION BY bucket ORDER BY stage_idx)
       |      AS prev,
       |    first_value(n_keys) OVER (PARTITION BY bucket
       |      ORDER BY stage_idx) AS first_n
       |  FROM c)""".stripMargin
  }

  // ------------------- streaming A/B monitor (§2.10 ext)
  // q236 per event poll: the per-key converted-ever state merges by
  // MAX (idempotent — redeliveries fold away), so the accumulated
  // verdict equals one-shot exactly and q239 shares q236's oracle.
  private def q239StreamingAbTest(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("ab_stream")
      .toString
    val ev = Tables.events(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.AbTestStream.ingestBatch(s,
        ev.filter(col("event_id") % 3 === b),
        col("user_id"), col("event_type"), "purchase", state)
    }
    graft.streaming.AbTestStream.readVerdict(s, state)
  }

  // ------------------- streaming windowed funnel (§2.10 ext)
  // q196 per ingest poll under the ScdStream arrival contract (batches
  // split on the ts VALUE, so per-key arrival is ts-monotone and equal
  // instants co-arrive): the per-key stage-times state re-derives each
  // touched key through the batch cascade, so the accumulated funnel
  // equals one-shot exactly and q240 shares q196's oracle verbatim.
  private def q240StreamingFunnel(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("funnel_stream")
      .toString
    tsValueBatches(s, d).foreach { b =>
      graft.streaming.FunnelStream.ingestBatch(s, b, "user_id", "ts",
        "event_type", q191Stages, Some(q196GapSeconds), state)
    }
    graft.streaming.FunnelStream.readFunnel(s, q191Stages, state)
  }

  // ------------------- streaming last-touch attribution (§2.10 ext)
  // q197 per ingest poll, same arrival contract: per-conversion verdicts
  // are final at their poll (no later touch can precede an already-seen
  // conversion), fold additively into channel partials, and the per-key
  // last-touch state is the only retention — so q241 shares q197's
  // oracle verbatim.
  private def q241StreamingAttribution(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("attr_stream")
      .toString
    tsValueBatches(s, d).foreach { b =>
      graft.streaming.AttributionStream.ingestBatch(s, b, "user_id",
        "ts", "event_type", "event_id", "value", "purchase",
        Seq("view", "click"), q197LookbackSeconds, state)
    }
    graft.streaming.AttributionStream.readAttribution(s, state)
  }

  /** The events table split into 3 ts-VALUE batches (the q203 pattern):
    * boundaries cut on the timestamp value, so per-key arrival is
    * ts-monotone and equal instants co-arrive — the documented contract
    * of the Scd/Funnel/Attribution streams. */
  private def tsValueBatches(s: SparkSession, d: String)
      : Seq[DataFrame] = {
    val ev = Tables.events(s, d).withColumn("tsu", unix_micros(col("ts")))
    val cuts = ev.stat.approxQuantile("tsu", Array(0.33, 0.66), 0.0)
    Seq(
      ev.where(col("tsu") < cuts(0)),
      ev.where(col("tsu") >= cuts(0) && col("tsu") < cuts(1)),
      ev.where(col("tsu") >= cuts(1))).map(_.drop("tsu"))
  }

  // ------------------- grouped jackknife (§2.10 ext)
  // Delete-one-SOURCE jackknife for the corpus mean-tokens-per-doc
  // ratio: the uncertainty number row-level i.i.d. SEs fake (documents
  // within a source are correlated). q234 = one-row summary with the
  // normal-approx CI; q235 = the per-source influence ranking.
  private def q234JackknifeSummary(s: SparkSession, d: String)
      : DataFrame =
    graft.operators.Trend.jackknifeSummary(Tables.documents(s, d),
      col("source"), graft.functions.TextExprs.tokenCount(col("text")),
      lit(1L))

  private def q235JackknifePanel(s: SparkSession, d: String): DataFrame =
    graft.operators.Trend.jackknifePanel(Tables.documents(s, d),
      col("source"), graft.functions.TextExprs.tokenCount(col("text")),
      lit(1L))

  private val q23xJackCtes =
    """WITH base AS (SELECT source AS grp,
      |    CAST(round(CAST(
      |      CASE WHEN length(trim(text)) = 0 THEN 0
      |           ELSE len(regexp_split_to_array(trim(text), '\s+')) END
      |      AS DOUBLE) * 1e6) AS BIGINT) AS n6,
      |    CAST(round(CAST(1 AS DOUBLE) * 1e6) AS BIGINT) AS d6
      |  FROM documents WHERE source IS NOT NULL),
      |sums AS (SELECT grp, CAST(sum(CAST(n6 AS HUGEINT)) AS HUGEINT)
      |    AS n_g,
      |    CAST(sum(CAST(d6 AS HUGEINT)) AS HUGEINT) AS d_g
      |  FROM base GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS g,
      |    CAST(sum(n_g) AS HUGEINT) AS tn,
      |    CAST(sum(d_g) AS HUGEINT) AS td FROM sums),
      |lo AS (SELECT grp, g, tn, td,
      |    CASE WHEN CAST(td - d_g AS DOUBLE) = 0.0 THEN NULL
      |      ELSE CAST(tn - n_g AS DOUBLE) / CAST(td - d_g AS DOUBLE)
      |    END AS th_loo
      |  FROM sums CROSS JOIN tot)""".stripMargin

  private val q234Sql =
    s"""$q23xJackCtes,
       |live AS (SELECT tn, td,
       |    CAST(round(th_loo * 1e9) AS BIGINT) AS t9
       |  FROM lo WHERE th_loo IS NOT NULL),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS g2, max(tn) AS tn,
       |    max(td) AS td,
       |    CAST(sum(CAST(t9 AS HUGEINT)) AS HUGEINT) AS s9 FROM live),
       |w AS (SELECT a.g2, a.tn, a.td, a.s9, live.t9
       |      FROM a CROSS JOIN live),
       |t AS (SELECT g2, tn, td, s9, CAST(round(
       |    (CAST(t9 AS DOUBLE) / 1e9 -
       |      CAST(s9 AS DOUBLE) / 1e9 / CAST(g2 AS DOUBLE)) *
       |    (CAST(t9 AS DOUBLE) / 1e9 -
       |      CAST(s9 AS DOUBLE) / 1e9 / CAST(g2 AS DOUBLE)) * 1e12)
       |    AS BIGINT) AS t12
       |  FROM w),
       |f AS (SELECT g2, tn, td, s9,
       |    CAST(sum(CAST(t12 AS HUGEINT)) AS HUGEINT) AS ss
       |  FROM t GROUP BY 1, 2, 3, 4)
       |SELECT g2 AS n_groups,
       |  round(CAST(tn AS DOUBLE) / CAST(td AS DOUBLE), 6) AS theta,
       |  round(CAST(s9 AS DOUBLE) / 1e9 / CAST(g2 AS DOUBLE), 6)
       |    AS jack_mean,
       |  round(sqrt((CAST(g2 AS DOUBLE) - 1.0) / CAST(g2 AS DOUBLE) *
       |    (CAST(ss AS DOUBLE) / 1e12)), 6) AS jack_se,
       |  round(CAST(tn AS DOUBLE) / CAST(td AS DOUBLE) -
       |    1.96 * sqrt((CAST(g2 AS DOUBLE) - 1.0) / CAST(g2 AS DOUBLE) *
       |      (CAST(ss AS DOUBLE) / 1e12)), 6) AS ci_lo,
       |  round(CAST(tn AS DOUBLE) / CAST(td AS DOUBLE) +
       |    1.96 * sqrt((CAST(g2 AS DOUBLE) - 1.0) / CAST(g2 AS DOUBLE) *
       |      (CAST(ss AS DOUBLE) / 1e12)), 6) AS ci_hi
       |FROM f""".stripMargin

  private val q235Sql =
    s"""$q23xJackCtes
       |SELECT grp, round(th_loo, 6) AS theta_loo,
       |  round((CAST(g AS DOUBLE) - 1.0) *
       |    (CAST(tn AS DOUBLE) / CAST(td AS DOUBLE) - th_loo), 6)
       |    AS influence
       |FROM lo""".stripMargin

  // ------------------- Fleiss' kappa, 3 filter gates (§2.10 ext)
  // q143's agreement diagnostic generalized to the real stacked-filter
  // case: learned gate (q77 >= 0.5), Gopher rule gate (q101), and a
  // length gate. One scan, one metadata row, exact integer pair counts.
  private val q214LenGate = 200L

  private def q214FleissKappa(s: SparkSession, d: String): DataFrame = {
    val scores = graft.operators.Classify.hashedLinearScore(
      Tables.documents(s, d), col("doc_id"), col("text"),
      q77Weights, q77Bias)
      .select(col("id").as("doc_id"), (col("score") >= 0.5).as("pa"))
    val gopher = q101GopherRules(s, d)
      .select(col("doc_id"), col("keep").as("pb"))
    val len = Tables.documents(s, d)
      .select(col("doc_id"), (col("n_chars") >= q214LenGate).as("pc"))
    graft.operators.Classify.fleissKappa(
      scores.join(gopher, Seq("doc_id")).join(len, Seq("doc_id")),
      Seq(col("pa"), col("pb"), col("pc")))
  }

  private val q214Sql =
    s"""WITH sc AS (SELECT doc_id, score >= CAST(0.5 AS DOUBLE) AS pa
       |           FROM ($q77Sql)),
       |gp AS (SELECT doc_id, keep AS pb FROM ($q101Sql)),
       |lg AS (SELECT doc_id, n_chars >= $q214LenGate AS pc
       |       FROM documents),
       |j AS (SELECT CAST(pa AS INT) + CAST(pb AS INT) + CAST(pc AS INT)
       |        AS k
       |      FROM sc JOIN gp USING (doc_id) JOIN lg USING (doc_id)
       |      WHERE pa IS NOT NULL AND pb IS NOT NULL AND pc IS NOT NULL),
       |c AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(sum(k) AS BIGINT) AS s_keep,
       |    CAST(sum(k * (k - 1) + (3 - k) * (3 - k - 1)) AS BIGINT)
       |      AS s_pairs
       |  FROM j),
       |d AS (SELECT n_items,
       |    CAST(s_keep AS DOUBLE) / CAST(n_items * 3 AS DOUBLE) AS p1,
       |    CAST(s_pairs AS DOUBLE) / CAST(n_items * 6 AS DOUBLE) AS pbar
       |  FROM c)
       |SELECT n_items, CAST(3 AS BIGINT) AS n_raters,
       |  round(p1, 6) AS p_keep, round(pbar, 6) AS p_bar,
       |  round(p1 * p1 + (1.0 - p1) * (1.0 - p1), 6) AS p_e,
       |  CASE WHEN p1 * p1 + (1.0 - p1) * (1.0 - p1) < 1.0
       |    THEN round((pbar - (p1 * p1 + (1.0 - p1) * (1.0 - p1))) /
       |      (1.0 - (p1 * p1 + (1.0 - p1) * (1.0 - p1))), 6)
       |  END AS kappa
       |FROM d""".stripMargin

  // ------------------- dedup threshold operating curve (§2.10 ext)
  // What each similarity cut costs, read off q18's pair table: pairs
  // surviving and distinct docs touched per threshold. Thresholds ride
  // the plan as a literal; pair table is id+score metadata.
  private val q215Thresholds = Seq(0.8, 0.85, 0.9, 0.95)

  private def q215ThresholdCurve(s: SparkSession, d: String): DataFrame =
    graft.operators.NearDup.thresholdCurve(q18ShingleJaccard(s, d),
      col("id_a"), col("id_b"), col("jaccard"), q215Thresholds,
      builtAt = 0.8)

  private val q215Sql =
    s"""WITH pairs AS ($q18Sql),
       |t AS (SELECT unnest([${q215Thresholds.mkString(", ")}])
       |        AS threshold),
       |e AS (SELECT t.threshold, p.id_a, p.id_b
       |      FROM pairs p JOIN t ON p.jaccard >= t.threshold),
       |np AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
       |       FROM e GROUP BY 1),
       |nd AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_docs
       |       FROM (SELECT DISTINCT threshold, id FROM (
       |               SELECT threshold, id_a AS id FROM e
       |               UNION ALL SELECT threshold, id_b FROM e))
       |       GROUP BY 1)
       |SELECT t.threshold,
       |  coalesce(np.n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
       |  coalesce(nd.n_docs, CAST(0 AS BIGINT)) AS n_docs
       |FROM t LEFT JOIN np USING (threshold)
       |  LEFT JOIN nd USING (threshold)""".stripMargin

  // ------------------- source-affinity map (§2.10 ext)
  // Pairwise cosine between per-label embedding centroids: which feeds
  // are the same domain under two names. Snap-9 decimal component sums,
  // snap-6 fixed-point means, integer dot/norms — order-free end to
  // end; the corpus shuffle carries (label, dim) partials, no vectors.
  private def q216SourceAffinity(s: SparkSession, d: String): DataFrame =
    graft.operators.Datasheet.sourceAffinity(Tables.embeddings(s, d),
      col("embedding"), col("label"), dims = 64)

  private val q216Sql =
    """WITH x AS (SELECT label AS src,
      |    generate_subscripts(embedding, 1) AS dim,
      |    unnest(CAST(embedding AS DOUBLE[])) AS v
      |  FROM embeddings),
      |a AS (SELECT src, dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(v * 1e9) AS HUGEINT)) AS HUGEINT) AS s9
      |  FROM x GROUP BY 1, 2),
      |cent AS (SELECT src, dim,
      |    CAST(round(CAST(s9 AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) * 1e6)
      |      AS BIGINT) AS m6
      |  FROM a),
      |norms AS (SELECT src,
      |    CAST(sum(CAST(m6 AS HUGEINT) * m6) AS HUGEINT) AS nn
      |  FROM cent GROUP BY 1),
      |dots AS (SELECT ca.src AS src_a, cb.src AS src_b,
      |    CAST(sum(CAST(ca.m6 AS HUGEINT) * cb.m6) AS HUGEINT) AS dt
      |  FROM cent ca JOIN cent cb USING (dim)
      |  WHERE ca.src < cb.src GROUP BY 1, 2)
      |SELECT CAST(src_a AS INTEGER) AS src_a,
      |  CAST(src_b AS INTEGER) AS src_b,
      |  CASE WHEN na.nn = 0 OR nb.nn = 0 THEN NULL
      |    ELSE round(CAST(dt AS DOUBLE) /
      |      (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))),
      |      6) END AS cos
      |FROM dots JOIN norms na ON dots.src_a = na.src
      |  JOIN norms nb ON dots.src_b = nb.src""".stripMargin

  // ------------------- prefix-LM split (§2.10 ext)
  // UL2 S-denoiser example generation: hash-derived interior pivot, both
  // sides non-empty, no RNG — the oracle replays both texts in full.
  private def q217PrefixLm(s: SparkSession, d: String): DataFrame =
    graft.operators.Mask.prefixLmSplit(Tables.documents(s, d),
      col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")

  private val q217Sql = {
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

  // ------------------- cluster silhouette (§2.10 ext)
  // Simplified (centroid-distance) silhouette per cluster over seed-row
  // centroids: the clustering-QA panel for the IVF family. Centroids
  // ride the plan as literals; the scan is pure map-side with snap-9
  // decimal means.
  private val q218NCentroids = 4

  private def q218Silhouette(s: SparkSession, d: String): DataFrame = {
    // k seed rows collected driver-side (the PQ codebook discipline)
    val cents = Tables.embeddings(s, d)
      .filter(col("vec_id") < q218NCentroids)
      .select(col("vec_id").cast("int").as("cid"),
        col("embedding").cast("array<double>").as("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toIndexedSeq.toSeq))
      .sortBy(_._1).toSeq
    graft.operators.Similarity.clusterSilhouette(
      Tables.embeddings(s, d), "embedding", cents)
  }

  private val q218Sql =
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |            FROM embeddings),
       |c AS (SELECT vec_id AS cid, v AS cv FROM e0
       |      WHERE vec_id < $q218NCentroids),
       |e AS (SELECT * FROM e0 WHERE v IS NOT NULL AND len(v) =
       |      (SELECT len(cv) FROM c ORDER BY cid LIMIT 1)),
       |dd AS (SELECT e.vec_id, c.cid,
       |    sqrt(greatest(list_inner_product(e.v, e.v) -
       |      2.0 * list_inner_product(e.v, c.cv) +
       |      list_inner_product(c.cv, c.cv), 0.0)) AS dist
       |  FROM e CROSS JOIN c),
       |r AS (SELECT vec_id, cid, dist, row_number() OVER (
       |        PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |      FROM dd),
       |ab AS (SELECT a.vec_id, a.cid AS cluster_id, a.dist AS ad,
       |    b.dist AS bd
       |  FROM (SELECT * FROM r WHERE rn = 1) a
       |  JOIN (SELECT * FROM r WHERE rn = 2) b USING (vec_id)),
       |s AS (SELECT cluster_id,
       |    CAST(round(ad * 1e9) AS HUGEINT) AS a9,
       |    CAST(round(bd * 1e9) AS HUGEINT) AS b9,
       |    CAST(round(CASE WHEN greatest(ad, bd) = 0.0 THEN 0.0
       |      ELSE (bd - ad) / greatest(ad, bd) END * 1e9) AS HUGEINT)
       |      AS s9
       |  FROM ab)
       |SELECT CAST(cluster_id AS INTEGER) AS cluster_id,
       |  CAST(count(*) AS BIGINT) AS n_points,
       |  round(CAST(sum(a9) AS DOUBLE) / 1e9 /
       |    CAST(count(*) AS DOUBLE), 6) AS mean_a,
       |  round(CAST(sum(b9) AS DOUBLE) / 1e9 /
       |    CAST(count(*) AS DOUBLE), 6) AS mean_b,
       |  round(CAST(sum(s9) AS DOUBLE) / 1e9 /
       |    CAST(count(*) AS DOUBLE), 6) AS mean_sil
       |FROM s GROUP BY 1""".stripMargin

  // ------------------- truncation sweep (§2.10 ext)
  // q206's audit over the CANDIDATE window sizes seq_len is picked
  // from, in ONE corpus scan: the lengths explode from a plan literal
  // onto the token-count metadata row, never the text.
  private val q213SeqLens = Seq(32, 64, 128, 256)

  private def q213TruncationSweep(s: SparkSession, d: String): DataFrame =
    graft.operators.Pack.truncationSweep(Tables.documents(s, d),
      graft.functions.TextExprs.tokenCount(col("text")), q213SeqLens)

  private val q213Sql =
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

  // ------------------- streaming transition matrix (§2.10 ext)
  // q202's Markov model updated per ingest batch: the count state is
  // additive once per-key boundary adjacencies are stitched from the
  // last-event table — under ts-ordered polls the accumulated matrix
  // equals the one-shot build exactly, so q207 shares q202's oracle.
  private def q207StreamingTransitions(s: SparkSession, d: String)
      : DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("trans_stream")
      .toString
    val ev = Tables.events(s, d).withColumn("tsu", unix_micros(col("ts")))
    val cuts = ev.stat.approxQuantile("tsu", Array(0.33, 0.66), 0.0)
    val batches = Seq(
      ev.where(col("tsu") < cuts(0)),
      ev.where(col("tsu") >= cuts(0) && col("tsu") < cuts(1)),
      ev.where(col("tsu") >= cuts(1)))
    batches.foreach { b =>
      graft.streaming.TransitionStream.ingestBatch(s, b.drop("tsu"),
        Seq("user_id"), "ts", "event_id", "event_type", state)
    }
    graft.streaming.TransitionStream.readMatrix(s, state)
  }

  // ------------------- TextRank keywords (§2.10 ext)
  // PageRank over the token co-occurrence graph: vocabulary-bounded
  // edges, 1e-12 fixed-point ranks, per-edge contributions snapped
  // before the per-node sum so all three iterations replay exactly.
  // Constants (damping, teleport mass) are emitted from the operator's
  // Scala doubles — (1-0.85)*1e12 is NOT the decimal 1.5e11 in IEEE.
  private val q201MinCount = 5L
  private val q201Damping = 0.85
  private val q201Iters = 3
  private val q201K = 25

  private def q201TextRank(s: SparkSession, d: String): DataFrame =
    graft.operators.TextRank.textRank(Tables.documents(s, d),
      col("text"), q201MinCount, q201Damping, q201Iters, q201K)

  private val q201Sql = {
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

  // ------------------- grouped OLS trend fit (§2.10 ext)
  // Per-source chars-vs-tokens regression line from decimal-exact
  // sufficient statistics: one map-side scan, groups-sized aggregate,
  // fixed IEEE closed form over the exact sums on both engines.
  private def q200OlsTrend(s: SparkSession, d: String): DataFrame =
    graft.operators.Trend.olsByGroup(Tables.documents(s, d),
      col("source"), col("n_chars"),
      graft.functions.TextExprs.tokenCount(col("text")))

  /** The decimal-exact OLS oracle tail over a CTE chain whose last
    * relation is `base(grp, x, y)` — shared by every Trend.olsByGroup
    * composition so the IEEE formula text is identical everywhere. */
  private def olsSqlOver(baseCtes: String): String =
    s"""$baseCtes,
      |st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM base GROUP BY 1),
      |d AS (SELECT grp, n,
      |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
      |    CAST(sy AS DOUBLE) AS syd,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
      |  FROM st)
      |SELECT grp, n, round(sxd / nd, 6) AS mean_x,
      |  round(syd / nd, 6) AS mean_y,
      |  round(CASE WHEN denx = 0 THEN NULL ELSE num / denx END, 6)
      |    AS slope,
      |  round((syd - CASE WHEN denx = 0 THEN NULL ELSE num / denx END
      |    * sxd) / nd, 6) AS intercept,
      |  round(CASE WHEN denx = 0 OR deny = 0 THEN NULL
      |    ELSE (num * num) / (denx * deny) END, 6) AS r2
      |FROM d""".stripMargin

  private val q200Sql = olsSqlOver(
    """WITH base AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS x,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END
      |      AS BIGINT) AS y
      |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL)"""
      .stripMargin)

  // ------------------- Zipf rank-frequency slope (§2.10 ext)
  // Corpus-health scalar per source: the log-log rank-frequency slope
  // (natural text ≈ -1). One point per DISTINCT frequency (tie-group
  // min-rank), snapped lns, then the shared decimal-exact OLS tail.
  private def q205ZipfSlope(s: SparkSession, d: String): DataFrame =
    graft.operators.Vocab.zipfSlopeByGroup(Tables.documents(s, d),
      col("source"), col("text"))

  private val q205Sql = olsSqlOver(
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
  private val q206SeqLen = 64

  private def q206TruncationLoss(s: SparkSession, d: String): DataFrame =
    graft.operators.Pack.truncationLoss(Tables.documents(s, d),
      col("source"),
      graft.functions.TextExprs.tokenCount(col("text")), q206SeqLen)

  private val q206Sql =
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

  // ------------------- streaming OOV rate (§2.10 ext)
  // q195's tokenizer-coverage audit in its real regime: the (grp, token)
  // count state is additive, so the accumulated table equals the
  // one-shot table exactly under any arrival split — the read shares
  // q195's oracle verbatim.
  private def q199StreamingOov(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("oov_stream")
      .toString
    val docs = Tables.documents(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.OovStream.ingestBatch(s,
        docs.filter(col("doc_id") % 3 === b),
        col("source"), col("text"), state)
    }
    graft.streaming.OovStream.readRates(s, state, q195MinCount)
  }

  // ------------------- UniMax allocation (§2.10 ext)
  // Epoch-capped uniform budget split (Chung et al. 2023): exact
  // water-filling on the sources-cardinality totals table. With
  // maxEpochs=1 and an 26k budget over ~27k tokens, the small sources
  // cap at one epoch and the rest share the remaining budget at the
  // water level.
  private val q198Budget = 26000L
  private val q198MaxEpochs = 1.0

  private def q198Unimax(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.unimaxAllocate(Tables.documents(s, d),
      col("source"),
      graft.functions.TextExprs.tokenCount(col("text")),
      q198Budget, q198MaxEpochs)

  private val q198Sql =
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

  // ------------------- last-touch attribution (§2.10 ext)
  // Each purchase credits the user's most recent view/click at-or-before
  // it (falling to 'unattributed' beyond the lookback) — composition
  // over the registered as-of join; values snap to cents before the
  // channel sum (dsum discipline). Oracle uses DuckDB's native ASOF
  // LEFT JOIN on touches deduped per (user, instant) with an explicit
  // max_by(event_id) winner, so the tie order matches by construction.
  private val q197LookbackSeconds = 7200L

  private def q197Attribution(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.lastTouchAttribution(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_type"), col("event_id"),
      col("value"), "purchase", Seq("view", "click"),
      q197LookbackSeconds)

  private val q197Sql = {
    val l = q197LookbackSeconds * 1000000L
    s"""WITH conv AS (SELECT user_id AS k, ts AS cts,
       |    CAST(round(value * 100) AS BIGINT) AS vc
       |  FROM events WHERE event_type = 'purchase'),
       |t0 AS (SELECT user_id AS k, ts AS tts,
       |    max_by(event_type, event_id) AS ch
       |  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1, 2),
       |a AS (SELECT conv.k, cts, vc, tts, ch FROM conv
       |  ASOF LEFT JOIN t0 ON conv.k = t0.k AND t0.tts <= conv.cts)
       |SELECT CASE WHEN tts IS NULL
       |    OR epoch_us(cts) - epoch_us(tts) > $l
       |    THEN 'unattributed' ELSE ch END AS channel,
       |  CAST(count(*) AS BIGINT) AS n_conversions,
       |  round(CAST(sum(vc) AS DOUBLE) / 100.0, 2) AS attributed_value
       |FROM a GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_join_tree" -> (q2JoinTree _),
    "q3_filters" -> (q3Filters _),
    "q4_scalars" -> (q4Scalars _),
    "q5_priority_dedup" -> (q5PriorityDedup _),
    "q6_batch_diff" -> (q6BatchDiff _),
    "q7_new_rows" -> (q7NewRows _),
    "q8_dup_groups" -> (q8DupGroups _),
    "q9_exact_dedup" -> (q9ExactDedup _),
    "q10_tz" -> (q10TzEpoch _),
    "q11_status_derive" -> (q11Status _),
    "q12_enum_reject" -> (q12EnumReject _),
    "q13_sort" -> (q13Sort _),
    "q14_topn" -> (q14TopN _),
    "q15_text_stats" -> (q15TextStats _),
    "q16_lang_id" -> (q16LangId _),
    "q17_fingerprint" -> (q17Fingerprint _),
    "q18_shingle_jaccard" -> (q18ShingleJaccard _),
    "q19_minhash_lsh" -> (q19MinhashLsh _),
    "q57_streaming_neardup" -> (q57StreamingNeardup _),
    "q20_simhash" -> (q20Simhash _),
    "q21_cosine_topk" -> (q21CosineTopK _),
    "q22_cosine_ivf" -> (q22CosineIvf _),
    "q23_emb_neardup" -> (q23EmbNearDup _),
    "q24_props_extract" -> (q24PropsExtract _),
    "q25_running_window" -> (q25RunningSum _),
    "q29_bpeish_tokens" -> (q29Bpeish _),
    "q30_quality_score" -> (q30Quality _),
    "q31_ivf_kmeans" -> (q31IvfKmeans _),
    "q32_simhash_pairs" -> (q32SimhashPairs _),
    "q33_salted_count" -> (q33SaltedCount _),
    "q34_salted_join" -> (q34SaltedJoin _),
    "q35_windowed_counts" -> (q35WindowedCounts _),
    "q37_rollup" -> (q37Rollup _),
    "q38_setops" -> (q38SetOps _),
    "q39_from_json" -> (q39FromJson _),
    "q40_percentiles" -> (q40Percentiles _),
    "q41_edit_distance" -> (q41EditDistance _),
    "q42_asof_join" -> (q42AsofJoin _),
    "q43_sessionize" -> (q43Sessionize _),
    "q44_dup_clusters" -> (q44DupClusters _),
    "q45_range_join" -> (q45RangeJoin _),
    "q46_pivot" -> (q46Pivot _),
    "q47_tfidf" -> (q47TfIdf _),
    "q48_hash_sample" -> (q48HashSample _),
    "q49_session_window" -> (q49SessionWindow _),
    "q50_pq_encode" -> (q50PqEncode _),
    "q51_pq_adc_topk" -> (q51PqAdc _),
    "q52_stratified_sample" -> (q52StratifiedSample _),
    "q53_full_outer" -> (q53FullOuter _),
    "q55_corpus_curation" -> (q55CorpusCuration _),
    "q56_kmv_distinct" -> (q56KmvDistinct _),
    "q58_heavy_hitters" -> (q58HeavyHitters _),
    "q59_repetition_stats" -> (q59Repetition _),
    "q60_token_shards" -> (q60TokenShards _),
    "q61_zorder_key" -> (q61Zorder _),
    "q62_decontaminate" -> (q62Decontaminate _),
    "q63_global_row_ids" -> (q63GlobalRowIds _),
    "q64_kmv_by_group" -> (q64KmvByGroup _),
    "q65_streaming_kmv" -> (q65StreamingKmv _),
    "q66_dup_spans" -> (q66DupSpans _),
    "q67_quantile_sketch" -> (q67QuantileSketch _),
    "q68_bm25_topk" -> (q68Bm25 _),
    "q69_pii_redact" -> (q69PiiRedact _),
    "q70_countmin" -> (q70CountMin _),
    "q71_bpe_pairs" -> (q71BpePairs _),
    "q72_bigram_nll" -> (q72BigramNll _),
    "q73_mix_sample" -> (q73MixSample _),
    "q74_pack_examples" -> (q74PackExamples _),
    "q75_streaming_hh" -> (q75StreamingHh _),
    "q76_streaming_quantile" -> (q76StreamingQuantile _),
    "q77_linear_score" -> (q77LinearScore _),
    "q78_streaming_countmin" -> (q78StreamingCountmin _),
    "q79_format_roundtrip" -> (q79FormatRoundtrip _),
    "q80_trending_users" -> (q80TrendingUsers _),
    "q81_quantiles_by_group" -> (q81QuantilesByGroup _),
    "q82_bpe_train" -> (q82BpeTrain _),
    "q83_bpe_encode" -> (q83BpeEncode _),
    "q84_doc_chunks" -> (q84Chunks _),
    "q85_knn_classify" -> (q85KnnClassify _),
    "q86_normalize_text" -> (q86Normalize _),
    "q87_split_assign" -> (q87Splits _),
    "q88_segment_dedup" -> (q88SegmentDedup _),
    "q91_streaming_segdedup" -> (q91StreamingSegDedup _),
    "q92_streaming_semdedup" -> (q92StreamingSemDedup _),
    "q89_semantic_dedup" -> (q89SemanticDedup _),
    "q90_trigram_nll" -> (q90TrigramNll _),
    "q93_ivfpq_topk" -> (q93IvfPq _),
    "q94_ivfpq_residual" -> (q94IvfPqResidual _),
    "q95_ivfpq_kernel" -> (q95IvfPqKernel _),
    "q96_bloom_decontaminate" -> (q96BloomDecontaminate _),
    "q97_streaming_ivfpq" -> (q97StreamingIvfPq _),
    "q98_stupid_backoff" -> (q98StupidBackoff _),
    "q99_sq8_topk" -> (q99Sq8TopK _),
    "q100_sq8_ivf" -> (q100Sq8Ivf _),
    "q101_gopher_rules" -> (q101GopherRules _),
    "q102_ccnet_buckets" -> (q102CcnetBuckets _),
    "q103_streaming_lm" -> (q103StreamingLmCounts _),
    "q104_bq_hamming" -> (q104BqTopK _),
    "q105_boilerplate_segments" -> (q105BoilerplateSegments _),
    "q106_dup_span_removal" -> (q106DupSpanRemoval _),
    "q107_rp_topk" -> (q107RpTopK _),
    "q108_fuzzy_decontaminate" -> (q108FuzzyDecontaminate _),
    "q109_ngram_diversity" -> (q109NgramDiversity _),
    "q110_dsir_weights" -> (q110DsirWeights _),
    "q111_kn_nll" -> (q111KnNll _),
    "q112_containment" -> (q112Containment _),
    "q113_char_entropy" -> (q113CharEntropy _),
    "q114_hard_negatives" -> (q114HardNegatives _),
    "q115_source_cap" -> (q115SourceCap _),
    "q116_length_histogram" -> (q116LengthHistogram _),
    "q117_rotation_pq" -> (q117RotationPq _),
    "q118_fertility" -> (q118Fertility _),
    "q119_blocklist" -> (q119Blocklist _),
    "q120_source_overlap" -> (q120SourceOverlap _),
    "q121_winnowing" -> (q121Winnowing _),
    "q122_overlap_sketch" -> (q122OverlapSketch _),
    "q123_source_quality_buckets" -> (q123SourceQualityBuckets _),
    "q124_hybrid_rrf" -> (q124HybridRrf _),
    "q125_logreg_train" -> (q125LogregTrain _),
    "q126_temperature_mix" -> (q126TemperatureMix _),
    "q127_hll_distinct" -> (q127HllDistinct _),
    "q128_mmr_select" -> (q128MmrSelect _),
    "q129_streaming_hll" -> (q129StreamingHll _),
    "q130_corpus_diff" -> (q130CorpusDiff _),
    "q131_unigram_nll" -> (q131UnigramNll _),
    "q132_span_corrupt" -> (q132SpanCorrupt _),
    "q133_priority_sample" -> (q133PrioritySample _),
    "q134_margin_align" -> (q134MarginAlign _),
    "q135_datasheet" -> (q135DatasheetCard _),
    "q136_filter_eval" -> (q136FilterEval _),
    "q137_auc" -> (q137Auc _),
    "q138_calibration" -> (q138Calibration _),
    "q139_streaming_tempmix" -> (q139StreamingTempMix _),
    "q140_boilerplate_ngrams" -> (q140BoilerplateNgrams _),
    "q141_ann_recall" -> (q141AnnRecall _),
    "q142_auc_by_source" -> (q142AucBySource _),
    "q143_filter_kappa" -> (q143FilterKappa _),
    "q144_avg_precision" -> (q144AvgPrecision _),
    "q145_ivfpq_learned_recall" -> (q145IvfPqLearnedRecall _),
    "q146_sq8_recall" -> (q146Sq8Recall _),
    "q147_bq_recall" -> (q147BqRecall _),
    "q148_ivfadc_learned_recall" -> (q148IvfadcLearnedRecall _),
    "q149_ap_by_source" -> (q149ApBySource _),
    "q150_ndcg_ivf" -> (q150NdcgIvf _),
    "q151_rr_ivf" -> (q151RrIvf _),
    "q152_mix_drift" -> (q152MixDrift _),
    "q153_streaming_mixdrift" -> (q153StreamingMixDrift _),
    "q154_calibration_error" -> (q154Ece _),
    "q155_lsh_recall" -> (q155LshRecall _),
    "q156_streaming_contam" -> (q156StreamingContam _),
    "q157_contam_by_source" -> (q157ContamBySource _),
    "q158_blocker_qa" -> (q158BlockerQa _),
    "q159_probe_sweep" -> (q159ProbeSweep _),
    "q160_score_drift" -> (q160ScoreDrift _),
    "q161_embed_health" -> (q161EmbedHealth _),
    "q162_prediction_churn" -> (q162PredictionChurn _),
    "q163_streaming_scoredrift" -> (q163StreamingScoreDrift _),
    "q164_neardup_matrix" -> (q164NearDupMatrix _),
    "q165_ks_drift" -> (q165KsDrift _),
    "q166_novel_grams" -> (q166NovelGrams _),
    "q167_split_leakage" -> (q167SplitLeakage _),
    "q168_effective_size" -> (q168EffectiveSize _),
    "q169_novelty_series" -> (q169NoveltySeries _),
    "q170_streaming_clusters" -> (q170StreamingClusters _),
    "q171_ks_by_source" -> (q171KsBySource _),
    "q172_streaming_embedhealth" -> (q172StreamingEmbedHealth _),
    "q173_opq_recall" -> (q173OpqRecall _),
    "q174_doremi_weights" -> (q174DoremiWeights _),
    "q175_pmi_collocations" -> (q175PmiCollocations _),
    "q176_cdc_chunks" -> (q176CdcChunks _),
    "q177_robust_outliers" -> (q177RobustOutliers _),
    "q178_image_dhash" -> (q178ImageDhash _),
    "q179_audio_envelope" -> (q179AudioEnvelope _),
    "q180_video_curve" -> (q180VideoCurve _),
    "q181_streaming_doremi" -> (q181StreamingDoremi _),
    "q182_rank_normalize" -> (q182RankNormalize _),
    "q183_dedup_aware_mix" -> (q183DedupAwareMix _),
    "q184_streaming_outliers" -> (q184StreamingOutliers _),
    "q185_dhash_recall" -> (q185DhashRecall _),
    "q186_cluster_split" -> (q186ClusterSplit _),
    "q187_cdc_dedup_rate" -> (q187CdcDedupRate _),
    "q188_effective_by_source" -> (q188EffectiveBySource _),
    "q189_rm3_expand" -> (q189Rm3 _),
    "q190_scd2_history" -> (q190Scd2 _),
    "q191_funnel" -> (q191Funnel _),
    "q192_retention" -> (q192Retention _),
    "q193_padding_overhead" -> (q193PaddingOverhead _),
    "q194_dsir_resample" -> (q194DsirResample _),
    "q195_oov_rate" -> (q195OovRate _),
    "q196_funnel_within" -> (q196FunnelWithin _),
    "q197_attribution" -> (q197Attribution _),
    "q198_unimax" -> (q198Unimax _),
    "q199_streaming_oov" -> (q199StreamingOov _),
    "q200_ols_trend" -> (q200OlsTrend _),
    "q201_textrank" -> (q201TextRank _),
    "q202_transitions" -> (q202Transitions _),
    "q203_streaming_scd2" -> (q203StreamingScd _),
    "q204_ql_retrieval" -> (q204QlTopK _),
    "q205_zipf_slope" -> (q205ZipfSlope _),
    "q206_truncation_loss" -> (q206TruncationLoss _),
    "q207_streaming_transitions" -> (q207StreamingTransitions _),
    "q208_session_summary" -> (q208SessionSummary _),
    "q209_streaming_zipf" -> (q209StreamingZipf _),
    "q210_concentration" -> (q210Concentration _),
    "q211_heaps_fit" -> (q211HeapsFit _),
    "q212_streaming_concentration" -> (q212StreamingConcentration _),
    "q213_truncation_sweep" -> (q213TruncationSweep _),
    "q214_fleiss_kappa" -> (q214FleissKappa _),
    "q215_threshold_curve" -> (q215ThresholdCurve _),
    "q216_source_affinity" -> (q216SourceAffinity _),
    "q217_prefix_lm" -> (q217PrefixLm _),
    "q218_silhouette" -> (q218Silhouette _),
    "q219_entropy" -> (q219Entropy _),
    "q220_categorical_balance" -> (q220CategoricalBalance _),
    "q221_streaming_affinity" -> (q221StreamingAffinity _),
    "q222_cluster_sizes" -> (q222ClusterSizes _),
    "q223_column_profile" -> (q223ColumnProfile _),
    "q224_normalized_dups" -> (q224NormalizedDups _),
    "q225_streaming_balance" -> (q225StreamingBalance _),
    "q226_rebalance" -> (q226Rebalance _),
    "q227_active_users" -> (q227ActiveUsers _),
    "q228_lang_confusion" -> (q228LangConfusion _),
    "q229_volume_anomaly" -> (q229VolumeAnomaly _),
    "q230_streaming_active" -> (q230StreamingActive _),
    "q231_association_rules" -> (q231AssociationRules _),
    "q232_inter_arrival" -> (q232InterArrival _),
    "q233_streaming_volume" -> (q233StreamingVolume _),
    "q234_jackknife_summary" -> (q234JackknifeSummary _),
    "q235_jackknife_panel" -> (q235JackknifePanel _),
    "q236_ab_test" -> (q236AbTest _),
    "q237_split_funnel" -> (q237SplitFunnel _),
    "q238_streaming_jackknife" -> (q238StreamingJackknife _),
    "q239_streaming_abtest" -> (q239StreamingAbTest _),
    "q240_streaming_funnel" -> (q240StreamingFunnel _),
    "q241_streaming_attribution" -> (q241StreamingAttribution _))

  val oracleSql: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "q2_join_tree" -> q2Sql,
    "q3_filters" -> q3Sql,
    "q4_scalars" -> q4Sql,
    "q5_priority_dedup" -> q5Sql,
    "q6_batch_diff" -> q6Sql,
    "q7_new_rows" -> q7Sql,
    "q8_dup_groups" -> q8Sql,
    "q9_exact_dedup" -> q9Sql,
    "q10_tz" -> q10Sql,
    "q11_status_derive" -> q11Sql,
    "q12_enum_reject" -> q12Sql,
    "q13_sort" -> q13Sql,
    "q14_topn" -> q14Sql,
    "q15_text_stats" -> q15Sql,
    "q16_lang_id" -> q16Sql,
    "q17_fingerprint" -> q17Sql,
    "q18_shingle_jaccard" -> q18Sql,
    "q19_minhash_lsh" -> q19Sql,
    "q57_streaming_neardup" -> q19Sql,
    "q20_simhash" -> q20Sql,
    "q21_cosine_topk" -> q21Sql,
    "q22_cosine_ivf" -> q22Sql,
    "q23_emb_neardup" -> q23Sql,
    "q24_props_extract" -> q24Sql,
    "q25_running_window" -> q25Sql,
    "q29_bpeish_tokens" -> q29Sql,
    "q30_quality_score" -> q30Sql,
    "q31_ivf_kmeans" -> q31Sql,
    "q32_simhash_pairs" -> q32Sql,
    "q33_salted_count" -> q33Sql,
    "q34_salted_join" -> q34Sql,
    "q35_windowed_counts" -> q35Sql,
    "q37_rollup" -> q37Sql,
    "q38_setops" -> q38Sql,
    "q39_from_json" -> q39Sql,
    "q40_percentiles" -> q40Sql,
    "q41_edit_distance" -> q41Sql,
    "q42_asof_join" -> q42Sql,
    "q43_sessionize" -> q43Sql,
    "q44_dup_clusters" -> q44Sql,
    "q45_range_join" -> q45Sql,
    "q46_pivot" -> q46Sql,
    "q47_tfidf" -> q47Sql,
    "q48_hash_sample" -> q48Sql,
    "q49_session_window" -> q49Sql,
    "q50_pq_encode" -> q50Sql,
    "q51_pq_adc_topk" -> q51Sql,
    "q52_stratified_sample" -> q52Sql,
    "q53_full_outer" -> q53Sql,
    "q55_corpus_curation" -> q55Sql,
    "q56_kmv_distinct" -> q56Sql,
    "q58_heavy_hitters" -> q58Sql,
    "q59_repetition_stats" -> q59Sql,
    "q60_token_shards" -> q60Sql,
    "q61_zorder_key" -> q61Sql,
    "q62_decontaminate" -> q62Sql,
    "q63_global_row_ids" -> q63Sql,
    "q64_kmv_by_group" -> q64Sql,
    "q65_streaming_kmv" -> q56Sql,
    "q66_dup_spans" -> q66Sql,
    "q67_quantile_sketch" -> q67Sql,
    "q68_bm25_topk" -> q68Sql,
    "q69_pii_redact" -> q69Sql,
    "q70_countmin" -> q70Sql,
    "q71_bpe_pairs" -> q71Sql,
    "q72_bigram_nll" -> q72Sql,
    "q73_mix_sample" -> q73Sql,
    "q74_pack_examples" -> q74Sql,
    "q75_streaming_hh" -> q58Sql,
    "q76_streaming_quantile" -> q67Sql,
    "q77_linear_score" -> q77Sql,
    "q78_streaming_countmin" -> q70Sql,
    "q79_format_roundtrip" -> q1Sql,
    "q80_trending_users" -> q80Sql,
    "q81_quantiles_by_group" -> q81Sql,
    "q82_bpe_train" -> q82Sql,
    "q83_bpe_encode" -> q83Sql,
    "q84_doc_chunks" -> q84Sql,
    "q85_knn_classify" -> q85Sql,
    "q86_normalize_text" -> q86Sql,
    "q87_split_assign" -> q87Sql,
    "q88_segment_dedup" -> q88Sql,
    "q91_streaming_segdedup" -> q88Sql,
    "q92_streaming_semdedup" -> q89Sql,
    "q89_semantic_dedup" -> q89Sql,
    "q90_trigram_nll" -> q90Sql,
    "q93_ivfpq_topk" -> q93Sql,
    "q94_ivfpq_residual" -> q94Sql,
    "q95_ivfpq_kernel" -> q95Sql,
    "q96_bloom_decontaminate" -> q62Sql,
    "q97_streaming_ivfpq" -> q95Sql,
    "q98_stupid_backoff" -> q98Sql,
    "q99_sq8_topk" -> q99Sql,
    "q100_sq8_ivf" -> q100Sql,
    "q101_gopher_rules" -> q101Sql,
    "q102_ccnet_buckets" -> q102Sql,
    "q103_streaming_lm" -> q98Sql,
    "q104_bq_hamming" -> q104Sql,
    "q105_boilerplate_segments" -> q105Sql,
    "q106_dup_span_removal" -> q106Sql,
    "q107_rp_topk" -> q107Sql,
    "q108_fuzzy_decontaminate" -> q108Sql,
    "q109_ngram_diversity" -> q109Sql,
    "q110_dsir_weights" -> q110Sql,
    "q111_kn_nll" -> q111Sql,
    "q112_containment" -> q112Sql,
    "q113_char_entropy" -> q113Sql,
    "q114_hard_negatives" -> q114Sql,
    "q115_source_cap" -> q115Sql,
    "q116_length_histogram" -> q116Sql,
    "q117_rotation_pq" -> q117Sql,
    "q118_fertility" -> q118Sql,
    "q119_blocklist" -> q119Sql,
    "q120_source_overlap" -> q120Sql,
    "q121_winnowing" -> q121Sql,
    "q122_overlap_sketch" -> q122Sql,
    "q123_source_quality_buckets" -> q123Sql,
    "q124_hybrid_rrf" -> q124Sql,
    "q125_logreg_train" -> q125Sql,
    "q126_temperature_mix" -> q126Sql,
    "q127_hll_distinct" -> q127Sql,
    "q128_mmr_select" -> q128Sql,
    "q129_streaming_hll" -> q127Sql,
    "q130_corpus_diff" -> q130Sql,
    "q131_unigram_nll" -> q131Sql,
    "q132_span_corrupt" -> q132Sql,
    "q133_priority_sample" -> q133Sql,
    "q134_margin_align" -> q134Sql,
    "q135_datasheet" -> q135Sql,
    "q136_filter_eval" -> q136Sql,
    "q137_auc" -> q137Sql,
    "q138_calibration" -> q138Sql,
    "q139_streaming_tempmix" -> q139Sql,
    "q140_boilerplate_ngrams" -> q140Sql,
    "q141_ann_recall" -> q141Sql,
    "q142_auc_by_source" -> q142Sql,
    "q143_filter_kappa" -> q143Sql,
    "q144_avg_precision" -> q144Sql,
    "q145_ivfpq_learned_recall" -> q145Sql,
    "q146_sq8_recall" -> q146Sql,
    "q147_bq_recall" -> q147Sql,
    "q148_ivfadc_learned_recall" -> q148Sql,
    "q149_ap_by_source" -> q149Sql,
    "q150_ndcg_ivf" -> q150Sql,
    "q151_rr_ivf" -> q151Sql,
    "q152_mix_drift" -> q152Sql,
    "q153_streaming_mixdrift" -> q152Sql,
    "q154_calibration_error" -> q154Sql,
    "q155_lsh_recall" -> q155Sql,
    "q156_streaming_contam" -> q62Sql,
    "q157_contam_by_source" -> q157Sql,
    "q158_blocker_qa" -> q158Sql,
    "q159_probe_sweep" -> q159Sql,
    "q160_score_drift" -> q160Sql,
    "q161_embed_health" -> q161Sql,
    "q162_prediction_churn" -> q162Sql,
    "q163_streaming_scoredrift" -> q160Sql,
    "q164_neardup_matrix" -> q164Sql,
    "q165_ks_drift" -> q165Sql,
    "q166_novel_grams" -> q166Sql,
    "q167_split_leakage" -> q167Sql,
    "q168_effective_size" -> q168Sql,
    "q169_novelty_series" -> q169Sql,
    "q170_streaming_clusters" -> q44Sql,
    "q171_ks_by_source" -> q171Sql,
    "q172_streaming_embedhealth" -> q161Sql,
    "q173_opq_recall" -> q173Sql,
    "q174_doremi_weights" -> q174Sql,
    "q175_pmi_collocations" -> q175Sql,
    "q176_cdc_chunks" -> q176Sql,
    "q177_robust_outliers" -> q177Sql,
    "q178_image_dhash" -> q178Sql,
    "q179_audio_envelope" -> q179Sql,
    "q180_video_curve" -> q180Sql,
    // the streaming read equals the one-shot q174 exactly (additive
    // count state) — same oracle by construction
    "q181_streaming_doremi" -> q174Sql,
    "q182_rank_normalize" -> q182Sql,
    "q183_dedup_aware_mix" -> q183Sql,
    // the streaming read equals the one-shot q177 exactly (additive
    // value-count state) — same oracle by construction
    "q184_streaming_outliers" -> q177Sql,
    "q185_dhash_recall" -> q185Sql,
    "q186_cluster_split" -> q186Sql,
    "q187_cdc_dedup_rate" -> q187Sql,
    "q188_effective_by_source" -> q188Sql,
    "q189_rm3_expand" -> q189Sql,
    "q190_scd2_history" -> q190Sql,
    "q191_funnel" -> q191Sql,
    "q192_retention" -> q192Sql,
    "q193_padding_overhead" -> q193Sql,
    "q194_dsir_resample" -> q194Sql,
    "q195_oov_rate" -> q195Sql,
    "q196_funnel_within" -> q196Sql,
    "q197_attribution" -> q197Sql,
    "q198_unimax" -> q198Sql,
    "q199_streaming_oov" -> q195Sql,
    "q200_ols_trend" -> q200Sql,
    "q201_textrank" -> q201Sql,
    "q202_transitions" -> q202Sql,
    "q203_streaming_scd2" -> q190Sql,
    "q204_ql_retrieval" -> q204Sql,
    "q205_zipf_slope" -> q205Sql,
    "q206_truncation_loss" -> q206Sql,
    "q207_streaming_transitions" -> q202Sql,
    "q208_session_summary" -> q208Sql,
    "q209_streaming_zipf" -> q205Sql,
    "q210_concentration" -> q210Sql,
    "q211_heaps_fit" -> q211Sql,
    "q212_streaming_concentration" -> q210Sql,
    "q213_truncation_sweep" -> q213Sql,
    "q214_fleiss_kappa" -> q214Sql,
    "q215_threshold_curve" -> q215Sql,
    "q216_source_affinity" -> q216Sql,
    "q217_prefix_lm" -> q217Sql,
    "q218_silhouette" -> q218Sql,
    "q219_entropy" -> q219Sql,
    "q220_categorical_balance" -> q220Sql,
    "q221_streaming_affinity" -> q216Sql,
    "q222_cluster_sizes" -> q222Sql,
    "q223_column_profile" -> q223Sql,
    "q224_normalized_dups" -> q224Sql,
    "q225_streaming_balance" -> q220Sql,
    "q226_rebalance" -> q226Sql,
    "q227_active_users" -> q227Sql,
    "q228_lang_confusion" -> q228Sql,
    "q229_volume_anomaly" -> q229Sql,
    "q230_streaming_active" -> q227Sql,
    "q231_association_rules" -> q231Sql,
    "q232_inter_arrival" -> q232Sql,
    "q233_streaming_volume" -> q229Sql,
    "q234_jackknife_summary" -> q234Sql,
    "q235_jackknife_panel" -> q235Sql,
    "q236_ab_test" -> q236Sql,
    "q237_split_funnel" -> q237Sql,
    "q238_streaming_jackknife" -> q234Sql,
    "q239_streaming_abtest" -> q236Sql,
    "q240_streaming_funnel" -> q196Sql,
    "q241_streaming_attribution" -> q197Sql)
}
