package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs
import graft.operators.{SketchState, Vocab}

/** Incremental Stupid-Backoff n-gram count tables over micro-batches —
  * the streaming regime of `Vocab.stupidBackoffNll`, and the formulation
  * Brants et al. 2007 built the distributed LM on in the first place:
  * the MODEL is nothing but count tables, and raw counts are ADDITIVE
  * (associative + commutative under per-key sum), so batches of training
  * text fold into the state in ANY arrival order or split and the
  * accumulated tables equal the whole-corpus tables EXACTLY — no
  * ordering caveat exists for counting, unlike the dedup streams'
  * first-arrival-wins degradation.
  *
  * State layout: three parquet tables under `statePath` —
  * `tri(w1,w2,w3,c3)`, `bi(w2,w3,c_br)`, `uni(w3,c1)` — each replaced
  * per batch by the crash-safe `SketchState.swapReplace` protocol
  * (write-swap / delete / rename; an interrupted swap is recovered or
  * clobbered, never half-adopted). Context marginals are NOT stored:
  * a marginal is not additive across batches, but it is a per-context
  * sum over the stored counts, so the scorer derives it with a
  * context-partitioned window (`Vocab.scoreBackoff`, shared verbatim
  * with the batch operator — the two regimes cannot drift).
  *
  * Scale shape: per batch, ONE tokenize of the batch (persisted, all
  * three increments re-derive), three TYPES-bounded groupBy increments,
  * and three merge shuffles of (state ∪ increment) — cost tracks
  * state-types + batch-types, never the accumulated token count. The
  * full state rewrite per merge is the simple-and-correct regime for
  * count tables that fit a shuffle; a 100 TB deployment with
  * trillion-type tables would delta-merge (LSM-style) on the same
  * additive property — the protocol seam (`swapReplace`) is where that
  * plugs in. */
object NgramLmStream {

  private def tok(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"), TextExprs.tokens(text).as("__ts"))

  /** Fold one batch of TRAINING text into the count tables. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, id: Column,
                  text: Column, statePath: String): Unit = {
    val toks = tok(batch, id, text).persist()
    try {
      merge(spark, s"$statePath/tri", Vocab.triTable(toks),
        Seq("w1", "w2", "w3"), "c3")
      merge(spark, s"$statePath/bi", Vocab.biTable(toks),
        Seq("w2", "w3"), "c_br")
      merge(spark, s"$statePath/uni", Vocab.uniTable(toks),
        Seq("w3"), "c1")
    } finally toks.unpersist()
  }

  private def merge(spark: SparkSession, path: String, inc: DataFrame,
                    keys: Seq[String], cnt: String): Unit = {
    val merged =
      if (SketchState.exists(spark, path))
        SketchState.read(spark, path).unionByName(inc)
          .groupBy(keys.map(col): _*).agg(sum(col(cnt)).as(cnt))
      else inc
    // swapReplace materializes the full swap copy BEFORE touching the
    // live dir, so `merged` reading from `path` itself is safe
    SketchState.swapReplace(merged, path)
  }

  /** Score held-out docs against the accumulated tables — identical
    * output to `Vocab.stupidBackoffNll` over (all ingested text) ∪
    * (the held docs as the `id % heldMod = 0` slice) because the scorer
    * IS the batch operator's score path over tables that are exactly the
    * batch tables. Pure plan over the state parquet + `docs`; no caches
    * outlive the call. */
  def scoreFromState(spark: SparkSession, statePath: String,
                     docs: DataFrame, id: Column, text: Column,
                     alpha: Double = 0.4): DataFrame =
    Vocab.scoreBackoff(
      Vocab.docTriples(tok(docs, id, text)),
      SketchState.read(spark, s"$statePath/tri"),
      SketchState.read(spark, s"$statePath/bi"),
      SketchState.read(spark, s"$statePath/uni"),
      alpha)
}
