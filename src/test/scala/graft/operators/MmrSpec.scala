package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MMR selection: diversity actually trades against relevance, λ=1
  * degrades to relevance order, determinism. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // query 0 at [1,0]; docs 1,2 nearly collinear with it; doc 3 orthogonal-ish
  // but still positive; doc 4 negative.
  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.999f, 0.04f)),
    (2L, Array(0.998f, 0.06f)),
    (3L, Array(0.5f, 0.86f)),
    (4L, Array(-1.0f, 0.1f))
  ).toDF("vec_id", "embedding")

  private def select(lambda: Double, k: Int) =
    Diversity.mmrSelect(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", poolN = 4, k = k, lambda = lambda)
      .orderBy("sel_rank")
      .select("doc_id").as[Long].collect().toSeq

  test("lambda=1 is pure relevance order") {
    assert(select(1.0, 3) === Seq(1L, 2L, 3L))
  }

  test("diversity penalty demotes the near-duplicate of the first pick") {
    // docs 1 and 2 are near-identical: pure relevance would pick (1, 2);
    // after picking 1, a diversity-heavy lambda must NOT spend the second
    // slot on doc 2 (here doc 4's negative similarity to doc 1 makes it
    // the maximal-margin pick — anti-correlated items are maximally
    // diverse under the raw-cosine penalty)
    val picks = select(0.3, 2)
    assert(picks.head === 1L)
    assert(picks(1) !== 2L, s"near-duplicate kept: $picks")
  }

  test("selects exactly k with sel_rank 1..k and mmr non-null") {
    val out = Diversity.mmrSelect(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", poolN = 4, k = 4, lambda = 0.7).collect()
    assert(out.length === 4)
    assert(out.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3, 4))
    assert(out.forall(!_.isNullAt(3)))
  }

  test("pool smaller than k emits fewer rows instead of throwing") {
    // 3-doc corpus, self excluded → the query's pool has exactly 2
    // candidates; asking for k=10 must emit 2 rows, not throw minBy
    // on an empty iterator
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.5f, 0.8f))
    ).toDF("vec_id", "embedding")
    val out = Diversity.mmrSelect(tiny, tiny.filter(col("vec_id") === 0L),
      "vec_id", "embedding", poolN = 10, k = 10, lambda = 0.7).collect()
    assert(out.length === 2)
    assert(out.map(_.getInt(1)).sorted.toSeq === Seq(1, 2))
    assert(out.map(_.getLong(2)).toSet === Set(1L, 2L))
  }

  test("deterministic under repartitioning") {
    val a = Diversity.mmrSelect(vecs, vecs.filter(col("vec_id") < 2),
      "vec_id", "embedding", 3, 2, 0.5).collect().map(_.toSeq).toSet
    val b = Diversity.mmrSelect(vecs.repartition(5),
      vecs.filter(col("vec_id") < 2), "vec_id", "embedding", 3, 2, 0.5)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
