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

  /** Deterministic prefix-LM example generation (UL2's S-denoiser /
    * PrefixLM objective, Tay et al. 2023): each document splits at a
    * hash-derived pivot into a bidirectionally-attended INPUT prefix and
    * a causally-predicted TARGET suffix. The pivot is
    * `1 + mixedHash(id) mod (n−1)` — uniform over the n−1 interior cut
    * points, both sides always non-empty, and a pure function of the id
    * (NO RNG: the same example set reproduces across runs, engines, and
    * partitionings — the [[spanCorrupt]] contract). Documents with
    * fewer than 2 tokens are DROPPED (no interior cut exists).
    *
    * Output: `(id, n_tokens, input_len, target_len, input_text,
    * target_text)`.
    *
    * Scale shape: entirely map-side — one tokenize, two array slices,
    * no shuffle, no join; a pure projection over the corpus scan. */
  def prefixLmSplit(docs: DataFrame, id: Column, text: Column)
      : DataFrame = {
    val base = docs.select(id.as("id"), TextExprs.tokens(text).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("id"), col("ts"), size(col("ts")).cast("long").as("n"))
    val pivot = pmod(Sketch.mixedHash(col("id").cast("string")),
      col("n") - 1L) + 1L
    base.select(col("id"), col("ts"), col("n").as("n_tokens"),
        pivot.as("input_len"))
      .withColumn("target_len", col("n_tokens") - col("input_len"))
      .select(col("id"), col("n_tokens"), col("input_len"),
        col("target_len"),
        concat_ws(" ", slice(col("ts"), lit(1),
          col("input_len").cast("int"))).as("input_text"),
        concat_ws(" ", slice(col("ts"), col("input_len").cast("int") + 1,
          col("target_len").cast("int"))).as("target_text"))
  }
}
