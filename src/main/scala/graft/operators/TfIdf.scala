package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** TF-IDF-style term weighting over a document corpus (SURVEY.md §2.10
  * text analysis): term frequencies per doc, document frequencies per
  * term, and top-k salient terms per doc ranked by tf/df.
  *
  * Scale shape: ONE explode of tokens → hash aggregate on (doc, term) for
  * tf → hash aggregate on term for df (both map-side combinable), then a
  * (term)-keyed join of the tiny df relation back to tf, and a per-doc
  * top-k window (WindowGroupLimit prunes map-side). No all-pairs
  * structure anywhere; shuffle volume is O(total tokens).
  *
  * The weight is the exact ratio tf/df (a monotone idf transform —
  * identical ranking to tf·idf for any df-decreasing idf at fixed tf,
  * without the cross-engine `ln` last-ulp hazard), so the result is
  * oracle-exact under the same single-division IEEE arithmetic. */
object TfIdf {

  /** (id, term, tf) — term frequencies over whitespace tokens, lowercased. */
  def termFrequencies(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"),
      explode(TextExprs.tokens(lower(text))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** (term, df) — number of docs containing each term. */
  def documentFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Top-`k` terms per doc by weight = tf/df (ties → lexicographic term). */
  def topTerms(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val tf = termFrequencies(docs, id, text)
    val df = documentFrequencies(tf)
    val weighted = tf.join(df, Seq("term"))
      .withColumn("weight", col("tf").cast("double") / col("df").cast("double"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("weight").desc, col("term").asc)
    weighted.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("weight"), 6).as("weight"))
  }
}
