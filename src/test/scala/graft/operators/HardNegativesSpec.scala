package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hard-negative mining semantics (label exclusion, false-negative guard,
  * map-side plan) and the orthogonal-rotation helper's invariants. */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // query 0 (label 0) vs a corpus engineered per case:
  //  id 1, label 0: identical vector        -> excluded (same label)
  //  id 2, label 1: identical vector        -> excluded (cos 1 > maxCos)
  //  id 3, label 1: close vector            -> the hardest negative
  //  id 4, label 2: orthogonal vector       -> ranked after 3
  private val rows = Seq(
    (0L, 0, Seq(1f, 0f, 0f, 0f)),
    (1L, 0, Seq(1f, 0f, 0f, 0f)),
    (2L, 1, Seq(2f, 0f, 0f, 0f)),
    (3L, 1, Seq(1f, 0.3f, 0f, 0f)),
    (4L, 2, Seq(0f, 1f, 0f, 0f))
  ).toDF("vec_id", "label", "embedding")

  test("hardNegatives excludes same-label rows and near-identical vectors") {
    val got = Similarity.hardNegatives(rows,
        rows.filter(col("vec_id") === 0), "vec_id", "embedding", "label",
        k = 5, maxCos = 0.995)
      .select("rank", "neighbor_id", "neighbor_label")
      .as[(Int, Long, Int)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1, 3L, 1), (2, 4L, 2)),
      s"expected [3 then 4], got $got")
  }

  test("raising maxCos past 1.0 admits the duplicate-looking negative") {
    val got = Similarity.hardNegatives(rows,
        rows.filter(col("vec_id") === 0), "vec_id", "embedding", "label",
        k = 5, maxCos = 1.1)
      .select("rank", "neighbor_id").as[(Int, Long)].collect()
      .sortBy(_._1).toSeq
    assert(got === Seq((1, 2L), (2, 3L), (3, 4L)))
  }

  test("plan: broadcast queries, map-side rank prune, no cartesian") {
    val p = Similarity.hardNegatives(rows, rows.filter(col("vec_id") === 0),
        "vec_id", "embedding", "label", k = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), "rank must prune map-side")
    assert(!p.contains("CartesianProduct"), "no cartesian allowed")
  }

  test("orthogonalMatrix: R·Rᵀ = I and rotation preserves dot products") {
    val dim = 16
    val r = Similarity.orthogonalMatrix(dim, seed = 42L)
    for (i <- 0 until dim; j <- 0 until dim) {
      val d = (0 until dim).map(k => r(i)(k) * r(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"R·Rᵀ[$i][$j] = $d")
    }
    // distance preservation on concrete vectors, through the plan
    val v = Seq(
      (1L, (0 until dim).map(i => (i + 1).toDouble)),
      (2L, (0 until dim).map(i => math.sin(i.toDouble))))
      .toDF("id", "v")
    val rot = v.select(col("id"), Similarity.rpProject(col("v"), r).as("rv"))
    val Array(a, b) = rot.orderBy("id").collect()
      .map(_.getAs[collection.Seq[Double]]("rv").toIndexedSeq)
    val Array(a0, b0) = v.orderBy("id").collect()
      .map(_.getAs[collection.Seq[Double]]("v").toIndexedSeq)
    def dot(x: Seq[Double], y: Seq[Double]) = x.zip(y).map(t => t._1 * t._2).sum
    assert(math.abs(dot(a, b) - dot(a0, b0)) < 1e-8)
    assert(math.abs(dot(a, a) - dot(a0, a0)) < 1e-8)
  }

  test("degenerate dims are rejected") {
    intercept[IllegalArgumentException](Similarity.orthogonalMatrix(0, 1L))
  }
}
