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
}
