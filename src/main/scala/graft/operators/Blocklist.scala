package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Phrase-blocklist matching (§2.10 extension surface) — the
  * safety/domain filtering stage of corpus curation (C4's bad-words
  * filter, domain blocklists, boilerplate phrase kill-lists): given a
  * list of words/phrases, find every document containing any of them,
  * with occurrence and distinct-phrase counts. Matching is
  * case-insensitive whole-WORD-sequence (a phrase of k tokens matches a
  * doc's token k-gram — no substring false positives: "ass" does not
  * match "class", the classic blocklist bug).
  *
  * Scale shape (the Aho–Corasick role, relationally): the blocklist is
  * metadata-sized and BROADCAST; the corpus is tokenized ONCE per row
  * (let-bound HOF) and emits its sliding k-grams for exactly the k's the
  * blocklist contains; the broadcast hash join keeps only matching grams
  * map-side, so the ONLY shuffle is the per-doc count aggregate over
  * MATCHED gram rows — clean corpora shuffle almost nothing. Output is
  * the flagged docs only (id, n_hits, n_phrases): a blocklist's product
  * is the kill set; callers drop it with an anti-join. Emitting a row
  * for every clean doc would make the output corpus-cardinality for no
  * information.
  */
object Blocklist {

  /** Docs with ≥ 1 blocklist match: `(id, n_hits, n_phrases)` where
    * `n_hits` counts occurrences (a doc repeating a blocked phrase 50×
    * scores 50) and `n_phrases` counts distinct phrases matched.
    * Phrases are whitespace-tokenized and lowercased; empty/duplicate
    * entries are dropped. */
  def phraseHits(docs: DataFrame, id: Column, text: Column,
      phrases: Seq[String]): DataFrame = {
    // Locale.ROOT, matching Spark's locale-independent lower(): JVM
    // default-locale toLowerCase silently breaks matches under e.g. the
    // Turkish dotted/dotless I.
    val plist = phrases
      .map(_.trim.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " "))
      .filter(_.nonEmpty).distinct
    require(plist.nonEmpty, "blocklist must contain at least one phrase")
    val lens = plist.map(_.split(" ").length).distinct.sorted
    val spark = docs.sparkSession
    import spark.implicits._
    val ptab = plist.map(p => (p.split(" ").length, p)).toDF("plen", "phrase")
    // one tokenize per row (let-bound), all needed gram lengths emitted
    // from the same token array in one pass
    val grams = element_at(transform(
      array(TextExprs.tokens(lower(text))), ts =>
        flatten(array(lens.map(n => Diversity.slideGrams(ts, n)): _*))), 1)
    docs.select(id.as("id"), explode(grams).as("g"))
      .join(broadcast(ptab), col("g") === col("phrase"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("phrase")).as("n_phrases"))
  }
}
