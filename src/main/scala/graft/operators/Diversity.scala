package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Corpus-level n-gram diversity — the repetitiveness signal reported on
  * training-corpus datasheets (type-token ratio at n=1; distinct-n /
  * total-n for higher n, the corpus-side quantity behind Self-BLEU-style
  * diversity metrics): per group (source, language, shard …) and per n,
  * the total n-gram occurrences, the distinct n-gram count, and their
  * ratio. Low ratios flag template-heavy or boilerplate-dominated
  * sources before they flood a training mix.
  *
  * Scale shape:
  *  - grams are generated map-side per doc (one let-bound tokenize per
  *    requested n — slide, not shingle-distinct: totals count every
  *    occurrence);
  *  - only `(group, hash128(gram))` enters the distinct aggregate —
  *    gram TEXT never shuffles (the q9/q88 128-bit-key trade; the
  *    oracle groups by the gram string itself so a collision would
  *    surface as a count mismatch);
  *  - `count(DISTINCT h1, h2)` plans as Expand + two-phase hash
  *    aggregate with map-side partial distinct — the exact regime; at
  *    vocabularies that outgrow it, [[Sketch.kmvDistinctByGroup]] is
  *    the k-bounded approximate path with the same group keying.
  */
object Diversity {

  /** Every n-gram occurrence of the token array (NOT deduplicated —
    * unlike `TextExprs.wordShingles`, which is a distinct SET for
    * similarity). Empty when the doc has fewer than n tokens. */
  private[operators] def slideGrams(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ts) - n),
        i => array_join(slice(ts, i + 1, lit(n)), " ")))

  /** Per `group` and per n in `ns`: `(grp, n, n_grams, n_distinct,
    * diversity = n_distinct / n_grams)`. A group whose docs all have
    * fewer than n tokens contributes no grams and is absent at that n
    * (explode drops it), same as the relational formulation. */
  def ngramDiversity(docs: DataFrame, text: Column, group: Column,
                     ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"need ns >= 1, got $ns")
    val base = docs.select(group.as("grp"), TextExprs.tokens(text).as("ts"))
    ns.map { n =>
      base.select(col("grp"), explode(slideGrams(col("ts"), n)).as("g"))
        .select(col("grp"), xxhash64(col("g")).as("h1"),
          xxhash64(col("g"), lit(1)).as("h2"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_grams"),
          countDistinct(col("h1"), col("h2")).as("n_distinct"))
        .select(col("grp"), lit(n).as("n"), col("n_grams"),
          col("n_distinct"),
          round(col("n_distinct").cast("double") /
            col("n_grams").cast("double"), 6).as("diversity"))
    }.reduce(_ unionByName _)
  }

  /** Per-group token-length histogram in power-of-two buckets — the
    * length-distribution panel of a corpus datasheet (and the input to
    * curriculum/packing decisions: how much of a source is sub-context-
    * length shorts vs truncation-risk longs). Bucket is `⌊log2 n⌋ + 1`
    * computed as the LENGTH OF THE BINARY STRING of the token count
    * (`bin(n)`) — pure integer/string arithmetic, no float log2 whose
    * boundary values (`log2(2^k)`) would be at the mercy of libm; bucket
    * 0 holds empty docs. All outputs are exact integers → hash-exact
    * across engines.
    *
    * Scale shape: token counts are map-side (one let-bound tokenize),
    * the aggregate is a two-level map-combined groupBy over (group,
    * bucket) — output cardinality groups × ~40 buckets, metadata-sized;
    * the corpus shuffles only its pre-aggregated partials. */
  def lengthHistogram(docs: DataFrame, text: Column,
                      group: Column): DataFrame = {
    val nTok = TextExprs.tokenCount(text).cast("long")
    val bucket = when(nTok === 0, lit(0))
      .otherwise(length(bin(nTok)).cast("int"))
    docs.select(group.as("grp"), nTok.as("n_tok"), bucket.as("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
  }
}
