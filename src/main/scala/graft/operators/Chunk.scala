package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Document chunking (§2.10 extension surface): split long documents into
  * fixed-size token windows with overlap — the context-length preparation
  * stage that precedes sequence packing in a training-data pipeline
  * (chunk → filter → pack), and the retrieval-index unit for RAG corpora.
  *
  * Pure map-side: tokens are materialized ONCE per row (the HOF
  * let-binding discipline — see Vocab.pairRows), the chunk index range is
  * integer arithmetic on the token count, and the explode emits one row
  * per chunk with `slice` windows over the materialized array. No
  * shuffle, no UDF; the corpus scan streams through a single projection.
  */
object Chunk {

  /** One row per chunk: `(id, chunk_idx, n_tokens, chunk_text)`.
    * Chunk i covers tokens `[i·stride, i·stride + size)` with
    * `stride = size − overlap`; the final chunk may be short, and a doc
    * with ≤ `size` tokens yields exactly one chunk (its whole self). Docs
    * with zero tokens yield nothing. `chunk_text` re-joins the window
    * with single spaces — a normalization both engines reproduce
    * identically, so the operator is fully oracle-expressible. */
  def tokenChunks(df: DataFrame, id: Column, text: Column,
      size: Int, overlap: Int): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val stride = size - overlap
    val ts = col("__ts")
    val n = org.apache.spark.sql.functions.size(ts)
    // n <= size → 1 chunk; else 1 + ceil((n - size) / stride), in exact
    // integer form: 1 + (n - size + stride - 1) div stride
    val nChunks = when(n <= size, lit(1))
      .otherwise(lit(1) + floor((n - size + stride - 1) / lit(stride))
        .cast("int"))
    df.select(id.as("id"), TextExprs.tokens(text).as("__ts"))
      .filter(n > 0)
      .select(col("id"), ts,
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        slice(ts, col("chunk_idx") * stride + 1, lit(size)).as("__w"))
      .select(col("id"), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__w")).as("n_tokens"),
        concat_ws(" ", col("__w")).as("chunk_text"))
  }
}
