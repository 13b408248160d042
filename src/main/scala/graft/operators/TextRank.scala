package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
  * the token co-occurrence graph — nodes are corpus tokens, undirected
  * edges connect ADJACENT tokens weighted by co-occurrence count, and a
  * fixed number of damped power iterations scores each token by graph
  * centrality. Raw frequency surfaces stopwords; centrality surfaces the
  * tokens the corpus's phrase structure actually pivots on — the
  * unsupervised keyword/keyphrase miner of the lexical stack, and the
  * repo's second graph operator (connected components being the first).
  *
  * Determinism (the dsum discipline for data-driven sums): ranks live as
  * 1e-12 fixed-point longs; each edge contribution is ONE fixed IEEE
  * expression over exact inputs — `round(r_e12 · d · w / wdeg)` — snapped
  * to a long BEFORE the per-node sum, so accumulation is exact-integer
  * and order-free, and both engines replay every iteration bit-for-bit.
  * Self-loops (immediately repeated tokens) are dropped; `minCount`
  * prunes hapax edges, which is what bounds the graph.
  *
  * Scale shape: the graph is VOCABULARY-bounded, never corpus-bounded —
  * one corpus gram scan builds the edge counts, and every iteration is
  * an edge-table join against the vocab-sized rank table (degrees
  * pre-joined onto edges once). The final top-k is a distributed
  * TakeOrderedAndProject, rank minted over k rows. The convenience
  * [[textRank]] form re-derives the edge table lazily, so Catalyst
  * re-runs the corpus gram scan per iteration (the q175 PMI lesson) —
  * petabyte callers materialize edges once and use
  * [[textRankFromEdges]], the sufficient-statistic entry.
  */
object TextRank {

  /** Undirected co-occurrence edges `(a, b, w)` with `a < b`,
    * self-loops dropped, `w ≥ minCount` — [[textRank]]'s sufficient
    * statistic (one corpus gram scan; additive counts). */
  def cooccurrenceEdges(docs: DataFrame, text: Column,
                        minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    Vocab.pairRows(docs, None, text)
      .where(col("l_tok") =!= col("r_tok"))
      .groupBy(least(col("l_tok"), col("r_tok")).as("a"),
        greatest(col("l_tok"), col("r_tok")).as("b"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= minCount)
  }

  /** Top-`k` keywords of `docs` by TextRank centrality:
    * `(rank, token, score)`. */
  def textRank(docs: DataFrame, text: Column, minCount: Long,
               damping: Double, iterations: Int, k: Int): DataFrame =
    textRankFromEdges(cooccurrenceEdges(docs, text, minCount),
      damping, iterations, k)

  /** [[textRank]] over a pre-materialized undirected edge table
    * `(a, b, w)`. */
  def textRankFromEdges(und: DataFrame, damping: Double,
                        iterations: Int, k: Int): DataFrame = {
    require(damping > 0 && damping < 1,
      s"damping must be in (0,1), got $damping")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(k >= 1, s"k must be >= 1, got $k")
    // symmetrize, then pre-join each source's weighted degree ONCE —
    // iterations touch only (src, dst, w, wdeg) and the rank table
    val ed = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(
        und.select(col("b").as("src"), col("a").as("dst"), col("w")))
    val wd = ed.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val edw = ed.join(wd, Seq("src"))
    val nn = wd.agg(count(lit(1)).as("nn"))
    var ranks = wd.crossJoin(broadcast(nn))
      .select(col("src").as("tok"),
        round(lit(1e12) / col("nn").cast("double")).cast("long")
          .as("r_e12"))
    (1 to iterations).foreach { _ =>
      // ONE fixed IEEE expression per edge, snapped before the sum
      val contrib = round(col("r_e12").cast("double") * damping *
        col("w").cast("double") / col("wdeg").cast("double")).cast("long")
      val agg = edw.join(ranks, col("src") === col("tok"))
        .groupBy(col("dst"))
        .agg(sum(contrib).as("s"))
      ranks = agg.crossJoin(broadcast(nn))
        .select(col("dst").as("tok"),
          (round(lit((1.0 - damping) * 1e12) / col("nn").cast("double"))
            .cast("long") + col("s")).as("r_e12"))
    }
    val top = ranks.orderBy(col("r_e12").desc, col("tok").asc).limit(k)
    // k rows by construction; sanctioned always-zero non-foldable
    // partition key (see Vocab.topPairs)
    val w = Window.partitionBy(pmod(col("r_e12"), lit(1L)))
      .orderBy(col("r_e12").desc, col("tok").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("tok").as("token"),
        round(col("r_e12").cast("double") / 1e12, 6).as("score"))
  }
}
