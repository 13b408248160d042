package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Per-source dataset-card generation (the "datasheets for datasets"
  * panel a corpus release ships): one row per source with document and
  * token volume, exact-duplicate load, mean quality, and the HLL
  * distinct-token estimate — the five numbers that decide whether a
  * source enters a training mixture and at what weight.
  *
  * Composition discipline: each panel column is the EXISTING operator's
  * shape — exact-dup via the 128-bit content-hash groupBy ([[Dedup]]'s
  * trade: the oracle groups by the text itself, a collision would
  * surface as a mismatch), distinct tokens via [[Sketch
  * .hllRegistersByGroup]]'s relational register aggregate, mean quality
  * as a decimal-exact sum of snap-6 scores over one double division.
  * Everything aggregates to sources × O(1) rows before the final joins;
  * the corpus is scanned, never shuffled at row grain. */
object Datasheet {

  def perSourceCard(docs: DataFrame, id: Column, text: Column,
      source: Column, hllP: Int = 8): DataFrame = {
    val base = docs.select(id.as("id"), source.as("src"), text.as("text"),
      TextExprs.tokens(text).as("ts"))
    val vol = base.groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("ts")).cast("long")).as("n_tokens"))
    // quality reuses base's token array (lowered per token — identical
    // to re-splitting lower(text), see qualityScoreFromLowerTokens)
    // instead of paying two more regex splits per row
    val qual = base.filter(size(col("ts")) > 0)
      .select(col("src"),
        round(TextExprs.qualityScoreFromLowerTokens(col("text"),
          transform(col("ts"), t => lower(t))), 6).as("q"))
      .groupBy(col("src"))
      .agg((sum(col("q").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double")).as("mq"))
      .select(col("src"), round(col("mq"), 6).as("mean_quality"))
    val dup = base
      .groupBy(col("src"), struct(xxhash64(col("text")),
        xxhash64(col("text"), lit(1))).as("h"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .groupBy(col("src")).agg(sum(col("c")).as("n_dup_docs"))
    val dist = Sketch.hllDistinctByGroup(
      base.select(col("src"), explode(col("ts")).as("tok")),
      col("src"), col("tok"), hllP)
      .select(col("grp").as("src"),
        col("est_distinct").as("est_distinct_tokens"))
    vol.join(qual, Seq("src"), "left")
      .join(dup, Seq("src"), "left")
      .join(dist, Seq("src"), "left")
      .select(col("src"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
        col("mean_quality"), col("est_distinct_tokens"))
  }
}
