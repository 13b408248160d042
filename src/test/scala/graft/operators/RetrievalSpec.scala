package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RRF fusion: exact fixed-point scores, unranked-arm handling, tie-break,
  * determinism under repartitioning. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (String, Int, Long)*) =
    rows.toSeq.toDF("query_id", "rank", "doc_id")

  test("fused score is the exact integer sum of 1e12 div (c + rank)") {
    val a = ranking(("q", 1, 10L), ("q", 2, 20L))
    val b = ranking(("q", 1, 20L), ("q", 2, 30L))
    val out = Retrieval.rrfFuse(Seq(a, b), c = 60, k = 10)
      .orderBy(col("rank")).collect()
    val s = 1000000000000L
    // doc 20: rank2 in a + rank1 in b; doc 10: rank1 in a; doc 30: rank2 in b
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq === Seq(
      (20L, s / 62 + s / 61), (10L, s / 61), (30L, s / 62)))
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
  }

  test("docs absent from one arm contribute only the present arm's term") {
    val a = ranking(("q", 1, 1L))
    val b = ranking(("q", 1, 2L))
    val out = Retrieval.rrfFuse(Seq(a, b), c = 0, k = 10)
      .orderBy(col("doc_id")).collect()
    // equal scores (both rank 1) → tie-break on ascending doc_id
    assert(out.map(r => (r.getInt(1), r.getLong(2))).toSeq ===
      Seq((1, 1L), (2, 2L)))
  }

  test("k truncates per query, queries fuse independently") {
    val a = ranking(
      ("x", 1, 1L), ("x", 2, 2L), ("x", 3, 3L),
      ("y", 1, 7L))
    val out = Retrieval.rrfFuse(Seq(a), c = 60, k = 2)
    assert(out.filter(col("query_id") === "x").count() === 2)
    assert(out.filter(col("query_id") === "y").count() === 1)
  }

  test("deterministic under repartitioning") {
    val a = ranking((1 to 50).map(i => ("q", i, (i * 7 % 50).toLong)): _*)
    val b = ranking((1 to 50).map(i => ("q", i, (i * 13 % 50).toLong)): _*)
    val one = Retrieval.rrfFuse(Seq(a, b)).collect().map(_.toSeq).toSeq
    val two = Retrieval.rrfFuse(Seq(a.repartition(7), b.repartition(3)))
      .collect().map(_.toSeq).toSeq
    assert(one === two)
  }

  // independent reference for the snap-9 DCG term (plain scala doubles,
  // same fixed op order the operator and the oracle use)
  private def termE9(rel: Int, pos: Int): Long =
    math.rint((math.pow(2.0, rel) - 1.0) /
      (math.log(pos + 1.0) / math.log(2.0)) * 1e9).toLong

  test("ndcgAtK matches the hand-built reference: graded gains, unjudged " +
      "rank-0, unranked judged docs only in the ideal") {
    val ranked = Seq(("q", 1, 1L), ("q", 2, 2L), ("q", 3, 3L))
      .toDF("query_id", "rank", "doc_id")
    // d1 unjudged (rel 0); d9 judged rel 2 but NOT retrieved — it lowers
    // ndcg only through the ideal
    val qrels = Seq(("q", 2L, 3), ("q", 3L, 1), ("q", 9L, 2))
      .toDF("query_id", "doc_id", "rel")
    val r = Retrieval.ndcgAtK(ranked, qrels, k = 3).head()
    val dcg = termE9(3, 2) + termE9(1, 3)
    val idcg = termE9(3, 1) + termE9(2, 2) + termE9(1, 3)
    assert(r.getLong(1) === dcg)
    assert(r.getLong(2) === idcg)
    assert(r.getDouble(3) ===
      math.rint(dcg.toDouble / idcg.toDouble * 1e6) / 1e6)
  }

  test("ndcgAtK: perfect ranking scores 1.0; no positive judgments -> " +
      "null; ideal truncates at k") {
    val perfect = Seq(("q", 1, 5L), ("q", 2, 6L))
      .toDF("query_id", "rank", "doc_id")
    val qr = Seq(("q", 5L, 2), ("q", 6L, 1)).toDF("query_id", "doc_id", "rel")
    assert(Retrieval.ndcgAtK(perfect, qr, k = 2).head().getDouble(3) === 1.0)
    val noRel = Seq(("q", 0L, 0)).toDF("query_id", "doc_id", "rel")
    assert(Retrieval.ndcgAtK(perfect, noRel, k = 2).head().isNullAt(3))
    // 3 judged docs, k=2: the ideal must NOT count the third
    val qr3 = Seq(("q", 5L, 2), ("q", 6L, 1), ("q", 7L, 3))
      .toDF("query_id", "doc_id", "rel")
    val r = Retrieval.ndcgAtK(perfect, qr3, k = 2).head()
    assert(r.getLong(2) === termE9(3, 1) + termE9(2, 2))
  }

  test("reciprocalRankAtK: first relevant position, zero when none " +
      "in the top k") {
    val ranked = Seq(("a", 1, 1L), ("a", 2, 2L), ("a", 3, 3L),
      ("b", 1, 4L), ("b", 2, 5L))
      .toDF("query_id", "rank", "doc_id")
    val qrels = Seq(("a", 2L, 1), ("a", 3L, 2), ("b", 9L, 1))
      .toDF("query_id", "doc_id", "rel")
    val out = Retrieval.reciprocalRankAtK(ranked, qrels, k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getInt(1) === 2)
    assert(out("a").getDouble(2) === 0.5)
    assert(out("b").isNullAt(1))
    assert(out("b").getDouble(2) === 0.0)
  }
}
