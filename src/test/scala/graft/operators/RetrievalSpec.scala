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
}
