package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Deterministic span-corruption example generation (the masking step of
  * T5/BERT-style denoising objectives, run as a DATA-PIPELINE stage so
  * the same example set is reproducible across runs, engines, and
  * re-partitionings): token positions are grouped into fixed blocks of
  * `blockLen`; a block is masked iff the portable `mixedHash(id|block)`
  * lands in a `1/denom` slice — an expected corruption rate of
  * `1/denom` with NO RNG, the per-position analog of [[Mix]]'s hash
  * keep decisions. Masked tokens are replaced by `sentinel`.
  *
  * Scale shape: entirely map-side — one tokenize, two indexed HOF
  * passes (count + rewrite), no shuffle, no join; the plan is a pure
  * projection over the corpus scan. Every mask decision is a pure
  * function of `(id, block)`, so the oracle replays the full masked
  * text, not a rate proxy. Block-aligned masking yields contiguous
  * `blockLen`-token spans (the T5 regime) rather than i.i.d. token
  * drops; spans never straddle blocks by construction. */
object Mask {

  def spanCorrupt(docs: DataFrame, id: Column, text: Column,
      blockLen: Int, denom: Int, sentinel: String = "<mask>"): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    require(denom >= 2, s"denom must be >= 2 (1 would mask everything)")
    // i is the 0-based token index; the mask key is "id|blockIdx"
    def masked(idS: Column, i: Column): Column =
      pmod(Sketch.mixedHash(concat(idS, lit("|"),
        call_function("div", i.cast("long"), lit(blockLen.toLong))
          .cast("string"))), lit(denom.toLong)) === 0
    val base = docs.select(id.as("id"), TextExprs.tokens(text).as("ts"))
      .select(col("id"), col("ts"), col("id").cast("string").as("id_s"))
    base.select(col("id"), size(col("ts")).cast("long").as("n_tokens"),
      size(filter(col("ts"), (_, i) => masked(col("id_s"), i)))
        .cast("long").as("n_masked"),
      concat_ws(" ", transform(col("ts"), (t, i) =>
        when(masked(col("id_s"), i), lit(sentinel)).otherwise(t)))
        .as("masked_text"))
  }
}
