package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TimeExprs, VectorExprs}
import graft.operators.{Dedup, NearDup, Similarity}
import graft.sources.Tables

/** Streaming arms: every family's incremental form over SketchState-backed micro-batch ingest.
  *
  * One domain slice of the query registry (split from the single-file
  * registry in round 15 — same members, same semantics). Members are
  * `private[queries]` so cross-domain references keep working; `val`s
  * became `lazy val`s so initialization is order-independent across the
  * trait mix-in. Mixed into [[TestdataQueries]], which owns the maps.
  */
private[queries] trait TdqStreaming { this: TestdataQueries.type =>

  // ------------------------- session_window aggregation (§2.9 streaming)
  // The built-in merging session window, run in batch mode (same plan
  // serves streaming); oracle rebuilds the merge with lag/cumsum at full
  // microsecond precision (session_window merges gaps STRICTLY < gap).
  private[queries] def q49SessionWindow(s: SparkSession, d: String): DataFrame =
    graft.streaming.WindowedStats.sessionCounts(Tables.events(s, d),
        "ts", "user_id", "3600 seconds", "0 seconds")
      .select(col("user_id"),
        date_format(col("window_start"), tsFmt).as("ws"),
        date_format(col("window_end"), tsFmt).as("we"),
        col("n"))

  private[queries] lazy val q49Sql =
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

  // ---------- streaming IVF-PQ index (§2.10 embeddings, q97)
  // The q95 corpus arriving in 3 micro-batches: each batch residual-
  // encodes map-side against the FIXED codebooks and appends to a
  // list_id-partitioned codes index (ingest layout == serving layout ==
  // the DPP-pruned read). Encoding is a pure per-row function, so the
  // accumulated index equals the batch operator's codes under ANY
  // arrival split — topK over the index must therefore match q95's
  // oracle verbatim.
  private[queries] def q97StreamingIvfPq(s: SparkSession, d: String): DataFrame = {
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

  // ----------------------- streaming heavy hitters (§2.10 ext)
  // Incremental Misra-Gries over micro-batches: three arrival batches
  // (doc_id mod 3) ingest into one compressed MG state (≤ counters+1
  // parquet rows); the exact recount against the accumulated corpus
  // equals the batch operator's output for ANY arrival split — q75
  // shares q58's oracle, like q65 shares q56's.
  private[queries] def q75StreamingHh(s: SparkSession, d: String): DataFrame = {
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
  private[queries] def q76StreamingQuantile(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- streaming count-min sketch (§2.10 ext)
  // Counter addition is exact, so the merged micro-batch state is
  // bit-identical to the batch counter table for any arrival split —
  // q78 shares q70's oracle, closing the streaming-sketch family
  // (q65 KMV, q75 MG, q76 quantiles, q78 count-min).
  private[queries] def q78StreamingCountmin(s: SparkSession, d: String): DataFrame = {
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

  // ----------------------------- streaming segment dedup (§2.10 ext)
  // q88's incremental counterpart: three doc_id-monotone micro-batches
  // through SegDedupStream must reproduce the batch operator exactly, so
  // the oracle IS q88's SQL (the q57/q19 equivalence pattern).
  private[queries] def q91StreamingSegDedup(s: SparkSession, d: String): DataFrame = {
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
  private[queries] def q92StreamingSemDedup(s: SparkSession, d: String): DataFrame = {
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

  // ----------------------------- streaming LM counts (§2.10 streaming)
  // q98's count tables accumulated across 3 micro-batches of the train
  // split, then scored from state. Raw n-gram counts are additive, so the
  // accumulated tables equal the batch tables EXACTLY for any split — the
  // oracle is q98's SQL verbatim (the q96/q97 oracle-reuse precedent).
  private[queries] def q103StreamingLmCounts(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- streaming HyperLogLog (§2.10 ext)
  // Register max-merge is exact/commutative/idempotent, so the
  // accumulated micro-batch state is bit-identical to the batch register
  // table for any arrival split — q129 shares q127's oracle, extending
  // the streaming-sketch family (q65 KMV, q75 MG, q76 quantiles, q78
  // count-min) with its fifth member.
  private[queries] def q129StreamingHll(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- streaming temperature mixing (§2.10 ext)
  // Online q126: totals accumulate in crash-safe state; each batch's
  // keep decisions use rates from everything seen so far (including the
  // batch). The oracle unrolls the three batches with cumulative-total
  // rate CTEs — every batch's drifting rates replay exactly.
  private[queries] def q139StreamingTempMix(s: SparkSession, d: String): DataFrame = {
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

  private[queries] lazy val q139Sql = {
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

  // ------------------- streaming mix drift (§2.10 ext)
  // q152's monitoring panel in its real regime: the "new" snapshot
  // arrives in three arbitrary micro-batches folded into the per-source
  // volume state (counts are additive, so the accumulated state equals
  // the one-shot volumes EXACTLY — no ordering caveat), then one drift
  // read against the reference volumes. Identical output to q152 by
  // construction, so the oracle is q152's SQL verbatim.
  private[queries] def q153StreamingMixDrift(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- streaming decontamination (§2.10 ext)
  // q62's regime made honest: corpus documents AND benchmark suites both
  // arrive incrementally (three batches, split by id % 3 — most
  // doc/benchmark gram encounters cross batch boundaries in BOTH
  // directions: doc-before-gram and gram-before-doc). Each hit is
  // counted when its later side arrives, so the accumulated read equals
  // the one-shot batch operator for any arrival split and q62's oracle
  // certifies this query verbatim.
  private[queries] def q156StreamingContam(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- adaptive gram-index growth (§2.10 ext)
  // q156's regime with the adaptive layout FORCED through its growth
  // path: a tiny bucketTargetBytes makes the gram index rebucket
  // (1 → maxBuckets via the crash-safe swap) between the doc batches, so
  // later appends land in a GROWN layout and the benchmark increments
  // bucket-prune against it. Hits are counted identically at every
  // modulus (the marker travels inside the swap, so probe modulus ==
  // layout modulus at every crash point). Runs on a QUARTER corpus
  // slice (doc_id % 4 = 0) — the growth path still triggers at every
  // SF, and the registry doesn't pay the full contam-stream cost twice
  // (q156 already covers the full corpus); q249Sql is q62's oracle
  // restricted to the same slice. TWO polls, not three: growth triggers
  // identically after the first (the 16 KB target rebuckets batch 0's
  // index at every SF, spec-checked below by the marker read), and the
  // witness needs exactly one grown-layout append + pruned-probe batch
  // after it — the third poll only repeated that at ~35 Spark jobs of
  // fixture cost (SCALE.md ops28: the floor is job count, not data).
  private[queries] def q249ContamAdaptive(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("contam_adaptive")
      .toString
    val docs = Tables.documents(s, d)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id").as("id"), col("text"))
    (0 until 2).foreach { b =>
      val arrivals = docs.filter(col("id") % 2 === b)
      graft.streaming.ContamStream.ingestBatch(s,
        newDocs = arrivals.filter(col("id") % q62BenchMod =!= 0),
        newBench = arrivals.filter(col("id") % q62BenchMod === 0),
        stateDir = state, n = 3,
        bucketTargetBytes = 1L << 14, maxBuckets = 32)
      if (b == 0) // the growth WITNESS: poll 1 must append + probe GROWN
        require(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$state/grams/_graft_nbuckets")))
          .trim.toInt > 1,
          "q249 growth witness: index must rebucket after poll 0")
    }
    graft.streaming.ContamStream.contamination(s, state)
      .select(col("id").as("doc_id"), col("n_shingles"), col("n_overlap"),
        col("contaminated"))
  }

  private[queries] lazy val q249Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM documents WHERE doc_id % 4 = 0),
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

  // ------------------- streaming DoReMi reweighting (§2.10 ext)
  // q174's weights re-derived after every ingest batch from additive
  // (src, token) count state — the accumulated table equals the
  // one-shot table EXACTLY under any arrival split, so the streaming
  // read shares q174's oracle verbatim.
  private[queries] def q181StreamingDoremi(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- streaming robust outliers (§2.10 ext)
  // q177's median/MAD panel after every ingest batch from additive
  // (src, value) count state — median/MAD has no constant-size
  // sufficient statistic, so the value-count table IS the minimal
  // exact state; the read equals the one-shot panel bit for bit and
  // shares q177's oracle verbatim.
  private[queries] def q184StreamingOutliers(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- streaming novelty series (§2.10 ext)
  // q166's question per ingest batch: how much of each arriving batch is
  // content the accumulated corpus has never seen (novelty → 0 means the
  // feed is re-crawling itself). A gram is novel exactly once — in the
  // batch where it FIRST appears — so the oracle is a first-batch
  // attribution over the same deterministic id % 3 split.
  private[queries] def q169NoveltySeries(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("novel_stream")
      .toString
    val docs = Tables.documents(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.NovelGramStream.ingestBatch(s,
        docs.filter(col("doc_id") % 3 === b), col("text"), b.toLong, state)
    }
    graft.streaming.NovelGramStream.noveltySeries(s, state)
  }

  private[queries] lazy val q169Sql =
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
  // when its later endpoint arrives, and each poll folds ITS pairs into
  // ClusterStream's alias-log union-find state — so the cluster read
  // resolves a #merges-sized forest (pointer doubling + one broadcast
  // label join) instead of recomputing CC over every pair ever
  // discovered (the r15 shape, whose read grew with pair history). The
  // alias log's union-by-min labeling equals connectedComponents'
  // exactly (ClusterStreamSpec pins it under arbitrary arrival splits),
  // so q44's oracle keeps certifying this query verbatim.
  private[queries] def q170StreamingClusters(s: SparkSession, d: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("cluster_stream")
      .toString
    val docs = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text"))
    (0 until 3).foreach { b =>
      // per-batch sink subdir: the poll's NEW pairs are exactly this
      // dir's rows (pair discovery is exactly-once across polls)
      graft.streaming.NearDupStream.ingestBatch(s,
        docs.filter(col("id") % 3 === b),
        s"$base/state", s"$base/sink/b$b",
        n = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)
      graft.streaming.ClusterStream.ingestPairs(s,
        s.read.parquet(s"$base/sink/b$b"), s"$base/clusters")
    }
    graft.streaming.ClusterStream.clusters(s, docs.select(col("id")),
        s"$base/clusters")
      .select(col("id").as("doc_id"), col("cluster_rep"))
  }

  // ------------------- streaming score drift (§2.10 ext)
  // q160's monitor in its real regime: the "current" snapshot arrives in
  // three micro-batches, each scored by the frozen filter and folded
  // into the (bin, n) histogram state — counts are additive, so the
  // accumulated histogram equals the one-shot binning EXACTLY and the
  // drift read against the reference histogram reproduces q160 verbatim
  // (its oracle certifies this query).
  private[queries] def q163StreamingScoreDrift(s: SparkSession, d: String)
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

  // ------------------- streaming embedding health (§2.10 ext)
  // q161's panel in its real regime: encoder output arrives in batches,
  // folded into the raw mergeable aggregate (counts, min/max, decimal
  // fixed-point norm sum — all associative, so the accumulated state
  // equals the one-shot panel EXACTLY for any arrival split). q161's
  // oracle certifies this query verbatim.
  private[queries] def q172StreamingEmbedHealth(s: SparkSession, d: String)
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

  // ------------------- streaming SCD2 (§2.10 ext)
  // q190's MERGE pattern run incrementally: three ts-ordered polls fold
  // into the version-table state; splits on the ts VALUE respect every
  // key's event order, so the accumulated table equals one-shot scd2
  // exactly and q203 shares q190's oracle verbatim.
  private[queries] def q203StreamingScd(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- streaming Zipf slope (§2.10 ext)
  // q205 read live off the SAME (grp, token) count state q199 keeps —
  // one sufficient statistic serving both the coverage and the
  // corpus-health monitor; shares q205's oracle verbatim.
  private[queries] def q209StreamingZipf(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- streaming vocab concentration (§2.10 ext)
  // q210 read live off the SAME (grp, token) count state q199/q209
  // keep — the third monitor served by one sufficient statistic; the
  // additive state equals the one-shot table exactly under any arrival
  // split, so q212 shares q210's oracle verbatim.
  private[queries] def q212StreamingConcentration(s: SparkSession, d: String)
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

  // ------------------- streaming source affinity (§2.10 ext)
  // q216 in its ingest regime: the per-source wide state (n, smax,
  // component sums) is associative, so the accumulated state equals the
  // one-shot raw table exactly — q221 shares q216's oracle verbatim.
  private[queries] def q221StreamingAffinity(s: SparkSession, d: String)
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

  // ------------------- streaming categorical balance (§2.10 ext)
  // q220 per ingest batch: the (src, cat) count state is additive, so
  // the accumulated table equals the one-shot exactly — q225 shares
  // q220's oracle verbatim.
  private[queries] def q225StreamingBalance(s: SparkSession, d: String)
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

  // ------------------- streaming DAU/WAU (§2.10 ext)
  // q227 per ingest poll: the distinct (key, day) grain merges by
  // union-distinct (idempotent — duplicate deliveries fold away), so
  // the accumulated grain equals one-shot exactly and q230 shares
  // q227's oracle verbatim.
  private[queries] def q230StreamingActive(s: SparkSession, d: String)
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

  // ------------------- streaming volume anomaly (§2.10 ext)
  // q229 per ingest poll: the (type, day) count state is additive, so
  // the accumulated table equals one-shot exactly and q233 shares
  // q229's oracle verbatim.
  private[queries] def q233StreamingVolume(s: SparkSession, d: String)
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
  private[queries] def q238StreamingJackknife(s: SparkSession, d: String)
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

  // ------------------- streaming A/B monitor (§2.10 ext)
  // q236 per event poll: the per-key converted-ever state merges by
  // MAX (idempotent — redeliveries fold away), so the accumulated
  // verdict equals one-shot exactly and q239 shares q236's oracle.
  private[queries] def q239StreamingAbTest(s: SparkSession, d: String)
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
  private[queries] def q240StreamingFunnel(s: SparkSession, d: String)
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
  private[queries] def q241StreamingAttribution(s: SparkSession, d: String)
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
  private[queries] def tsValueBatches(s: SparkSession, d: String)
      : Seq[DataFrame] = {
    val ev = Tables.events(s, d).withColumn("tsu", unix_micros(col("ts")))
    val cuts = ev.stat.approxQuantile("tsu", Array(0.33, 0.66), 0.0)
    Seq(
      ev.where(col("tsu") < cuts(0)),
      ev.where(col("tsu") >= cuts(0) && col("tsu") < cuts(1)),
      ev.where(col("tsu") >= cuts(1))).map(_.drop("tsu"))
  }

  // ------------------- streaming transition matrix (§2.10 ext)
  // q202's Markov model updated per ingest batch: the count state is
  // additive once per-key boundary adjacencies are stitched from the
  // last-event table — under ts-ordered polls the accumulated matrix
  // equals the one-shot build exactly, so q207 shares q202's oracle.
  private[queries] def q207StreamingTransitions(s: SparkSession, d: String)
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

  // ------------------- streaming OOV rate (§2.10 ext)
  // q195's tokenizer-coverage audit in its real regime: the (grp, token)
  // count state is additive, so the accumulated table equals the
  // one-shot table exactly under any arrival split — the read shares
  // q195's oracle verbatim.
  private[queries] def q199StreamingOov(s: SparkSession, d: String): DataFrame = {
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

  // ------------------- streaming weekly retention (§2.10 ext)
  // q192 per event poll. BOTH sufficient statistics are order-free
  // (min-merged cohort instants, distinct activity weeks), so the
  // accumulated matrix equals one-shot for ANY arrival split — no
  // ts-monotone contract at all. The polls here deliberately split by
  // USER HASH, not time (each batch spans the whole timeline), to
  // register that freedom; q244 shares q192's oracle verbatim.
  private[queries] def q244StreamingRetention(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("ret_stream")
      .toString
    val ev = Tables.events(s, d)
    (0 until 3).foreach { b =>
      graft.streaming.RetentionStream.ingestBatch(s,
        ev.filter(pmod(xxhash64(col("user_id")), lit(3L)) === b),
        "user_id", "ts", state)
    }
    graft.streaming.RetentionStream.readRetention(s, state)
  }

  // ------------------- streaming token-budget shards (§2.10 ext)
  // q60 per arrival poll: documents are packed into training shards the
  // moment they land, assignments FINAL at their poll (one carried
  // number — the accumulated weight — seeds each batch's prefix sum),
  // and the accumulated sink is row-identical to the one-shot q60 pass,
  // so q245 shares q60's oracle verbatim. Arrival splits on the doc_id
  // value (the ScdStream contract on the order column).
  private[queries] def q245StreamingShards(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("shard_stream")
      .toString
    val docs = Tables.documents(s, d).select(col("doc_id"),
      graft.functions.TextExprs.tokenCount(col("text")).cast("long")
        .as("n_tok"))
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    val lo = mm.getLong(0) - 1
    val span = mm.getLong(1) - lo
    val bounds = Seq(lo, lo + span / 3, lo + 2 * span / 3, Long.MaxValue)
    (0 until 3).foreach { b =>
      graft.streaming.ShardStream.ingestBatch(s,
        docs.filter(col("doc_id") > bounds(b) &&
          col("doc_id") <= bounds(b + 1)),
        "doc_id", "n_tok", q60Budget, state)
    }
    graft.streaming.ShardStream.readShards(s, state)
  }

  // ------------------- streaming corpus curation (§2.10 ext)
  // The training-set builder run incrementally: every poll is quality-
  // gated, deduplicated against everything already ACCEPTED, shingle-
  // decontaminated against the fixed q62 holdout, and packed into
  // token-budget shards — each document's fate final at its poll. The
  // honest streaming subset of q242 (near-dup CC and rebalancing are
  // global decisions and deliberately stay batch); under id-value
  // splits keep-first-seen == keep-min-id, so the accumulated sink is
  // row-identical to the one-shot quality → exact-dedup → decontaminate
  // → shard cascade the oracle replays.
  private[queries] def q246StreamingCuration(s: SparkSession, d: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("curation_stream")
      .toString
    val docs = Tables.documents(s, d)
    graft.streaming.CurationStream.installBenchmark(s,
      docs.filter(col("doc_id") % q62BenchMod === 0), "text", n = 3,
      stateDir = state)
    val corpus = docs.filter(col("doc_id") % q62BenchMod =!= 0)
    val mm = corpus.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    val lo = mm.getLong(0) - 1
    val span = mm.getLong(1) - lo
    val bounds = Seq(lo, lo + span / 3, lo + 2 * span / 3, Long.MaxValue)
    (0 until 3).foreach { b =>
      graft.streaming.CurationStream.ingestBatch(s,
        corpus.filter(col("doc_id") > bounds(b) &&
          col("doc_id") <= bounds(b + 1)),
        "doc_id", "text", q55QualityFloor, n = 3, budget = q60Budget,
        stateDir = state)
    }
    graft.streaming.CurationStream.readCurated(s, state)
  }

  private[queries] lazy val q246Sql =
    s"""WITH flt AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % $q62BenchMod <> 0 AND length(trim(text)) > 0
       |    AND round(
       |  $qualitySqlBody,
       |  6) >= $q55QualityFloor),
       |ex AS (
       |  SELECT doc_id, text FROM (
       |    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |    FROM flt) WHERE rn = 1),
       |ctoks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
       |  FROM ex),
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
       |  SELECT * FROM ex
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       |t AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
       |         AS BIGINT) AS n_tok
       |  FROM keep)
       |SELECT doc_id AS id, n_tok,
       |  CAST(coalesce(SUM(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    // $q60Budget AS BIGINT) AS shard
       |FROM t""".stripMargin
}
