package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Vocabulary-induction and n-gram language-model statistics over a token
  * corpus (§2.10 extension surface — the "train a tokenizer / score with a
  * cheap LM" stages of a training-data pipeline).
  *
  * Both operators are pure relational compositions over the adjacent-token
  * pair stream: explode once, aggregate with map-side combine, never
  * collect. The pair stream is the corpus's bigram multiset — the exact
  * object BPE training (Sennrich et al. 2016) counts each merge round, and
  * the sufficient statistic of a bigram MLE language model.
  */
object Vocab {

  /** Adjacent token pairs, one output row per occurrence, carrying the
    * given prefix columns: the token array is MATERIALIZED as a column
    * before the pair lambda touches it. Inlining `tokens(text)` into the
    * lambda would re-run the whitespace split per element access —
    * higher-order functions evaluate interpreted, with no CSE into
    * lambda bodies, so the once-per-row projection below is worth ~4× on
    * the pair stream (measured in ScaleProbe ops, 8k-doc corpus).
    * Docs with < 2 tokens contribute nothing. */
  private def pairRows(df: DataFrame, idOpt: Option[Column],
      text: Column): DataFrame = {
    val base = idOpt match {
      case Some(id) => df.select(id.as("id"), TextExprs.tokens(text).as("__ts"))
      case None => df.select(TextExprs.tokens(text).as("__ts"))
    }
    val ts = col("__ts")
    val pairs = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1), i =>
        struct(element_at(ts, i).as("l_tok"),
          element_at(ts, i + 1).as("r_tok"))))
      .otherwise(array().cast("array<struct<l_tok:string,r_tok:string>>"))
    val kept = if (idOpt.isDefined) Seq(col("id")) else Seq.empty[Column]
    base.select(kept :+ explode(pairs).as("p"): _*)
      .select(kept ++ Seq(col("p.l_tok").as("l_tok"),
        col("p.r_tok").as("r_tok")): _*)
  }

  /** One BPE-training merge round: the top-`k` adjacent token pairs by
    * corpus count — `(rank, l_tok, r_tok, n)`, ties broken
    * pair-lexicographically so the ranking is total and oracle-stable.
    *
    * Scale shape: one explode + a map-combinable pair count (partial
    * aggregation collapses each task to its distinct-pair set), then a
    * DISTRIBUTED top-k — `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject (per-partition heaps, k rows to the driver
    * stage), NOT a no-partition row_number window that would drag the
    * whole pair-count table into one task. The rank column is minted
    * after the limit, over k rows. */
  def topPairs(df: DataFrame, text: Column, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val counts = pairRows(df, None, text)
      .groupBy("l_tok", "r_tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_tok").asc, col("r_tok").asc)
      .limit(k)
    // k rows by construction; always-zero NON-FOLDABLE partition key
    // (pmod of the non-null count — a literal would be stripped by
    // EliminateWindowPartitions) = explicit single-tiny-task rank, no
    // empty-spec global window (see Sketch.quantilesFromSample's scaladoc
    // for the repo-wide rule)
    val w = Window.partitionBy(pmod(col("n"), lit(1L)))
      .orderBy(col("n").desc, col("l_tok").asc, col("r_tok").asc)
    counts.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("l_tok"), col("r_tok"), col("n"))
  }

  // wrapped-string corpus form for multi-round BPE: every token sits in
  // \u0001...\u0002 brackets, so one string `replace` of
  // "<1>l<2><1>r<2>" -> "<1>lr<2>" IS the greedy
  // left-to-right non-overlapping merge of pair (l, r) — the exact BPE
  // round semantics ("a a a" merges the first two), with identical
  // behavior in any engine's standard replace (the oracle replays every
  // round in SQL). The bracket chars are NOT guaranteed absent from raw
  // text (control chars are not whitespace, so tokens() would keep them)
  // — wrappedSeqs scrubs them to spaces first, making the boundary
  // invariant real rather than assumed; the oracle scrubs identically.
  private val S1 = "\u0001"
  private val S2 = "\u0002"

  /** The wrapped-string corpus: brackets scrubbed from the raw text, one
    * row per doc with ≥ 1 token. */
  private def wrappedSeqs(df: DataFrame, text: Column): DataFrame =
    df.select(
      concat_ws("", transform(
        TextExprs.tokens(regexp_replace(text, "[\u0001\u0002]", " ")),
        t => concat(lit(S1), t, lit(S2)))).as("s"))
      .filter(length(col("s")) > 0)

  /** Multi-round BPE training (Sennrich et al. 2016): K merge rounds,
    * each re-deriving adjacent-pair counts over the MERGED token
    * sequences of the previous round and merging the single most frequent
    * pair (ties pair-lexicographic, same total order as [[topPairs]]).
    * Returns the merge table `(round, l_tok, r_tok, n)` — the actual
    * tokenizer-training artifact.
    *
    * Scale shape: the corpus is held as one wrapped string per doc; each
    * round is (a) a split+explode pair count with map-side combine and a
    * distributed top-1 (TakeOrderedAndProject — ONE row to the driver,
    * which is the algorithm's inherent sequential decision, not a
    * driver-side loop over data), and (b) a map-side `replace` applying
    * the merge — the corpus never shuffles. Rounds materialize via
    * persist so round k+1 reads cached sequences, not a k-deep replace
    * chain. BPE training is inherently sequential in its merge decisions;
    * K bounded-size jobs is its minimal distributed form. */
  def bpeTrain(df: DataFrame, text: Column, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val spark = df.sparkSession
    var seqs = wrappedSeqs(df, text).persist()
    // the previous round's cache is released only AFTER the current
    // round's top-1 has materialized the current cache (the aggregate
    // below reads seqs through its persist) — one job per round, no
    // separate materializing count(), and never an unmaterialized persist
    // chain that would recompute back to round 0
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    try {
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val toksDf = seqs.select(
          split(expr("substring(s, 2, length(s) - 2)"),
            java.util.regex.Pattern.quote(S2 + S1)).as("__ts"))
        val tsc = col("__ts")
        val pairs = toksDf.select(explode(
          when(size(tsc) >= 2,
            transform(sequence(lit(1), size(tsc) - 1), i =>
              struct(element_at(tsc, i).as("l_tok"),
                element_at(tsc, i + 1).as("r_tok"))))
            .otherwise(array().cast(
              "array<struct<l_tok:string,r_tok:string>>"))).as("p"))
          .select(col("p.l_tok").as("l_tok"), col("p.r_tok").as("r_tok"))
        val top = pairs.groupBy("l_tok", "r_tok").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("l_tok").asc, col("r_tok").asc)
          .limit(1).collect() // materializes seqs' persist
        if (prev != null) { prev.unpersist(); prev = null }
        if (top.isEmpty) exhausted = true
        else {
          val l = top(0).getString(0)
          val rt = top(0).getString(1)
          merges += ((r, l, rt, top(0).getLong(2)))
          val next = seqs.select(
            replace(col("s"), lit(S1 + l + S2 + S1 + rt + S2),
              lit(S1 + l + rt + S2)).as("s"))
            .persist()
          prev = seqs
          seqs = next
        }
        r += 1
      }
    } finally {
      if (prev != null) prev.unpersist()
      seqs.unpersist()
    }
    import spark.implicits._
    merges.result().toDF("round", "l_tok", "r_tok", "n")
  }

  /** Apply a trained merge list (as produced by [[bpeTrain]], in training
    * order) to the corpus — BPE ENCODING, the inference half of the
    * tokenizer: `(id, n_raw, n_bpe, compression)` per document with ≥ 1
    * token, where `n_bpe` counts tokens after all merges and
    * `compression = n_raw / n_bpe` (rounded 4) is the per-doc
    * bytes-per-token proxy quality/efficiency signal.
    *
    * Scale shape: the merge list rides the plan as literals (same
    * discipline as Classify's model weights — no join), each merge is one
    * map-side `replace` on the wrapped-string form, and the token count
    * is recovered by counting markers — the corpus NEVER shuffles and the
    * whole encode is a single projection. */
  def bpeEncode(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val clean = regexp_replace(text, "[\u0001\u0002]", " ")
    val s0: Column = concat_ws("", transform(TextExprs.tokens(clean), t =>
      concat(lit(S1), t, lit(S2))))
    val sN = merges.foldLeft(s0) { case (acc, (l, r)) =>
      replace(acc, lit(S1 + l + S2 + S1 + r + S2), lit(S1 + l + r + S2))
    }
    df.select(id.as("id"), size(TextExprs.tokens(clean)).as("__nr"),
        sN.as("__s"))
      .filter(col("__nr") > 0)
      .select(col("id"),
        col("__nr").cast("long").as("n_raw"),
        (length(col("__s")) -
          length(replace(col("__s"), lit(S1), lit(""))))
          .cast("long").as("n_bpe"))
      .withColumn("compression",
        round(col("n_raw").cast("double") / col("n_bpe"), 4))
  }

  /** Per-document bigram-MLE negative log-likelihood — the classic cheap
    * quality/fluency signal (a KenLM-style filter with the corpus itself
    * as training set): `(id, n_bigrams, avg_nll)` where
    * `avg_nll = -mean ln C(l,r)/Cleft(l)` over the doc's adjacent pairs
    * and `Cleft(l)` is the left-context marginal (how many bigrams start
    * with `l`). Every doc bigram is in the corpus counts by construction,
    * so no smoothing term is needed and every probability is in (0, 1].
    * Docs with < 2 tokens have no bigrams and are excluded. The ln is the
    * one cross-engine float risk; round(…, 4) absorbs it (same discipline
    * as BM25's idf).
    *
    * Scale shape: the pair stream is exploded once per side; the count
    * table gets its left marginal from a window PARTITIONED BY l_tok (no
    * global window), and the score join is a single pair-keyed shuffle
    * join of the stream against the (vocab²-bounded) count table, then a
    * map-combinable per-doc aggregate. */
  def bigramNll(df: DataFrame, id: Column, text: Column): DataFrame = {
    val pairs = pairRows(df, Some(id), text)
    val counts = pairs.groupBy("l_tok", "r_tok").agg(count(lit(1)).as("c_lr"))
    val withMarginal = counts.withColumn("c_l",
      sum(col("c_lr")).over(Window.partitionBy(col("l_tok"))))
    pairs.join(withMarginal, Seq("l_tok", "r_tok"))
      .select(col("id"),
        log(col("c_lr").cast("double") / col("c_l").cast("double")).as("ll"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("ll")) / count(lit(1)), 4).as("avg_nll"))
  }
}
