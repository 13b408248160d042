package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing (§2.10 extension surface): lay the corpus's tokens
  * end-to-end in a global document order and cut the stream into
  * fixed-length training examples — the standard "packing" step that
  * turns variable-length documents into dense `seq_len`-token batches,
  * with documents allowed to span example boundaries.
  *
  * Row `d` with token count `w` and exclusive prefix offset `off` covers
  * examples `floor(off/L) .. floor((off+w-1)/L)`; inside example `e` its
  * tokens occupy `[max(0, e·L − off), min(w, (e+1)·L − off))` of the
  * document. Pure integer arithmetic — bit-for-bit reproducible.
  *
  * Scale shape: the prefix offsets come from `Shard.byBudget` with unit
  * budget (its distributed two-pass prefix sum — ONE range shuffle, no
  * single-task window); the span explode is map-side and emits
  * `ceil(w/L)+1`-bounded rows per doc. The oracle IS the no-partition
  * running-sum window this operator exists to avoid.
  */
object Pack {

  /** Assign each row's tokens to fixed-size examples. Output one row per
    * (doc, example) span: `(id, example_id, tok_start, tok_len)` with
    * `tok_start`/`tok_len` relative to the document's own tokens.
    * Zero-weight rows contribute no tokens and are dropped. `id` must be
    * castable to long and totally ordered (it defines the packing order,
    * same contract as `Shard.byBudget`). */
  def packExamples(df: DataFrame, id: String, weight: String,
      seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val l = lit(seqLen.toLong)
    def fdiv(a: Column, b: Column): Column = call_function("div", a, b)
    val off = Shard.byBudget(df, id, weight, 1L)
      .withColumnRenamed("shard", "off")
      .filter(col(weight) > 0)
    off
      .withColumn("example_id",
        explode(sequence(fdiv(col("off"), l),
          fdiv(col("off") + col(weight) - 1, l))))
      .select(col(id), col("example_id"),
        greatest(lit(0L), col("example_id") * l - col("off")).as("tok_start"),
        (least(col(weight).cast("long"), (col("example_id") + 1) * l - col("off")) -
          greatest(lit(0L), col("example_id") * l - col("off"))).as("tok_len"))
  }

  /** Padding-overhead audit for PADDED (non-packed) batching: when each
    * batch is padded to its longest member, how many pad tokens does a
    * batching strategy cost? Compares the two standard strategies on the
    * same corpus:
    *
    *  - `hashed`  — batch = hash(id) mod ceil(n/batchRows): the "random
    *    shuffle" baseline every trainer starts with;
    *  - `bucketed` — docs first bucket by `floor(len/bucketWidth)`, then
    *    hash-batch WITHIN the bucket: the length-grouped batching that
    *    bounds per-batch length spread to `bucketWidth`.
    *
    * One row per strategy: `(strategy, n_batches, real_tokens,
    * padded_tokens, overhead_ratio)` with `padded = Σ_batch max_len ·
    * rows` and `overhead = (padded − real) / real`.
    *
    * Scale shape: batch assignment is a map-side hash (the oracle-portable
    * linear-congruential mix — no engine-specific hash), so each strategy
    * is one groupBy on its batch key plus a batch-cardinality rollup. The
    * bucket-size table re-joins broadcast (cardinality ≤ maxLen /
    * bucketWidth). No global sort — this is the audit you run INSTEAD of
    * sorting the corpus by length.
    */
  /** Context-window truncation audit — the question asked before picking
    * `seq_len` (or before choosing truncation over [[packExamples]] /
    * chunking): per group, how many documents exceed the window and how
    * much token mass a hard truncation throws away. One row per group:
    * `(grp, n_docs, n_truncated, total_tokens, lost_tokens, trunc_share,
    * lost_share)`.
    *
    * Scale shape: pure map-side arithmetic on the token-count column
    * folded by ONE groups-cardinality aggregate — exact long sums, two
    * snap-6 divisions at group grain. Null token counts are excluded
    * (not zero-filled); an all-null group reports zero totals with null
    * shares rather than inventing a rate.
    */
  def truncationLoss(df: DataFrame, grp: Column, nTokens: Column,
                     seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val nt = nTokens.cast("long")
    df.filter(nt.isNotNull)
      .groupBy(grp.as("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(nt > seqLen, 1L).otherwise(0L)).as("n_truncated"),
        sum(nt).as("total_tokens"),
        sum(greatest(nt - seqLen, lit(0L))).as("lost_tokens"))
      .select(col("grp"), col("n_docs"), col("n_truncated"),
        col("total_tokens"), col("lost_tokens"),
        round(col("n_truncated").cast("double") /
          col("n_docs").cast("double"), 6).as("trunc_share"),
        when(col("total_tokens") === 0, lit(null).cast("double"))
          .otherwise(round(col("lost_tokens").cast("double") /
            col("total_tokens").cast("double"), 6)).as("lost_share"))
  }

  /** [[truncationLoss]] swept over CANDIDATE window sizes in one corpus
    * scan — the operating curve `seq_len` is actually picked from, not a
    * single point on it. Emits one GLOBAL row per candidate length:
    * `(seq_len, n_docs, n_truncated, total_tokens, lost_tokens,
    * trunc_share, lost_share)`.
    *
    * Scale shape: the corpus is scanned ONCE for the token count; the
    * candidate lengths explode from a plan LITERAL array onto the
    * (nt)-only metadata row — the ×|lengths| fan-out carries one long,
    * never the text — and fold by one |lengths|-cardinality aggregate.
    * Running [[truncationLoss]] per candidate would scan (and tokenize)
    * the corpus |lengths| times for the same answer.
    */
  def truncationSweep(df: DataFrame, nTokens: Column,
                      seqLens: Seq[Int]): DataFrame = {
    require(seqLens.nonEmpty, "truncationSweep needs >= 1 seqLen")
    require(seqLens.forall(_ >= 1),
      s"seqLens must be >= 1, got ${seqLens.mkString(",")}")
    require(seqLens.distinct.size == seqLens.size,
      s"seqLens must be distinct, got ${seqLens.mkString(",")}")
    val nt = nTokens.cast("long")
    val l = col("seq_len")
    df.filter(nt.isNotNull).select(nt.as("nt"))
      .select(col("nt"),
        explode(array(seqLens.map(x => lit(x.toLong)): _*)).as("seq_len"))
      .groupBy(l)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nt") > l, 1L).otherwise(0L)).as("n_truncated"),
        sum(col("nt")).as("total_tokens"),
        sum(greatest(col("nt") - l, lit(0L))).as("lost_tokens"))
      .select(l, col("n_docs"), col("n_truncated"),
        col("total_tokens"), col("lost_tokens"),
        round(col("n_truncated").cast("double") /
          col("n_docs").cast("double"), 6).as("trunc_share"),
        when(col("total_tokens") === 0, lit(null).cast("double"))
          .otherwise(round(col("lost_tokens").cast("double") /
            col("total_tokens").cast("double"), 6)).as("lost_share"))
  }

  def paddingOverhead(df: DataFrame, id: Column, nTokens: Column,
                      batchRows: Int, bucketWidth: Int): DataFrame = {
    require(batchRows >= 1 && bucketWidth >= 1,
      s"batchRows/bucketWidth must be >= 1, got $batchRows/$bucketWidth")
    def fdiv(a: Column, b: Column): Column = call_function("div", a, b)
    val base = df.select(id.cast("long").as("id"),
      nTokens.cast("long").as("nt"))
    // oracle-portable LCG mix: id stays < 2^31-scale, so the product is
    // exact in 64-bit on both engines
    val h = pmod(base("id") * 1103515245L + 12345L, lit(2147483647L))
    def summarize(strategy: String, batched: DataFrame): DataFrame =
      batched.groupBy(col("bk"))
        .agg(count(lit(1)).as("rows"), sum(col("nt")).as("real"),
          max(col("nt")).as("mx"))
        .agg(count(lit(1)).cast("long").as("n_batches"),
          sum(col("real")).cast("long").as("real_tokens"),
          sum(col("mx") * col("rows")).cast("long").as("padded_tokens"))
        .select(lit(strategy).as("strategy"), col("n_batches"),
          col("real_tokens"), col("padded_tokens"),
          round((col("padded_tokens") - col("real_tokens")).cast("double") /
            col("real_tokens").cast("double"), 6).as("overhead_ratio"))
    val nDocs = base.agg(count(lit(1)).as("n"))
    val hashed = base.crossJoin(broadcast(nDocs))
      .select(col("nt"),
        struct(pmod(h, greatest(lit(1L),
          ceil(col("n").cast("double") / batchRows).cast("long")))).as("bk"))
    val bucketed0 = base.select(col("id"), col("nt"),
      fdiv(col("nt"), lit(bucketWidth.toLong)).as("lb"))
    val bucketSizes = bucketed0.groupBy(col("lb"))
      .agg(count(lit(1)).as("cb"))
    val bucketed = bucketed0.join(broadcast(bucketSizes), Seq("lb"))
      .select(col("nt"),
        struct(col("lb"), pmod(h, greatest(lit(1L),
          ceil(col("cb").cast("double") / batchRows).cast("long")))).as("bk"))
    summarize("hashed", hashed).union(summarize("bucketed", bucketed))
  }
}
