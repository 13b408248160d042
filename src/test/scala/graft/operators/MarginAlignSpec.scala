package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Margin alignment: mutual-NN detection, margin ordering, determinism. */
class MarginAlignSpec extends SparkSpec {
  import spark.implicits._

  // A-side: two orthogonal anchors. B-side: a close match for each
  // anchor plus a "hub" diagonal vector similar to everything.
  private def a = Seq(
    (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))
  ).toDF("vec_id", "embedding")
  private def b = Seq(
    (11L, Array(0.99f, 0.14f)), (12L, Array(0.14f, 0.99f)),
    (13L, Array(0.7f, 0.7f))
  ).toDF("vec_id", "embedding")

  test("aligned pairs are mutual NN with margin above 1") {
    val out = Similarity.marginAlign(a, b, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 11L)
    assert(out(2L).getLong(1) === 12L)
    assert(out.values.forall(_.getBoolean(4)), "both pairs mutual")
    assert(out.values.forall(_.getDouble(3) > 1.0),
      "true matches beat their neighborhood average")
  }

  test("one row per a-side query; deterministic under repartitioning") {
    val x = Similarity.marginAlign(a.repartition(3), b.repartition(2),
      "vec_id", "embedding", 2).collect().map(_.toSeq).toSet
    val y = Similarity.marginAlign(a, b, "vec_id", "embedding", 2)
      .collect().map(_.toSeq).toSet
    assert(x === y)
    assert(x.size === 2)
  }
}
