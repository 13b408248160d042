package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Simplified silhouette (Similarity.clusterSilhouette) and prefix-LM
  * splitting (Mask.prefixLmSplit): hand geometry, tie assignment, and
  * the reconstruction/determinism contracts. */
class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  test("silhouette matches the hand geometry; d² tie assigns the " +
    "lower centroid id") {
    val cents = Seq(0 -> Seq(0.0, 0.0), 1 -> Seq(10.0, 0.0))
    val pts = Seq(
      Seq(1.0f, 0.0f),  // c0: a=1, b=9, s=8/9
      Seq(0.0f, 0.0f),  // c0: a=0, b=10, s=1
      Seq(5.0f, 0.0f),  // tie d=5 → c0 by id, s=0
      Seq(9.0f, 0.0f)   // c1: a=1, b=9, s=8/9
    ).toDF("embedding")
    val got = Similarity.clusterSilhouette(pts, "embedding", cents)
      .collect().map(_.toSeq).toSet
    // c0 means: a=(1+0+5)/3=2, b=(9+10+5)/3=8,
    // s=(round(8/9·1e9)+1e9+0)/3e9 → 0.62963
    assert(got === Set(
      Seq(0, 3L, 2.0, 8.0, 0.62963),
      Seq(1, 1L, 1.0, 9.0, 0.888889)))
    val err = intercept[IllegalArgumentException] {
      Similarity.clusterSilhouette(pts, "embedding",
        Seq(0 -> Seq(0.0, 0.0)))
    }
    assert(err.getMessage.contains(">= 2 centroids"))
  }

  test("silhouette drops null and wrong-dims embeddings instead of " +
    "tie-breaking them into the lowest centroid") {
    val cents = Seq(0 -> Seq(0.0, 0.0), 1 -> Seq(10.0, 0.0))
    val pts = Seq(
      Some(Seq(1.0f, 0.0f)),          // valid, c0
      None,                           // null embedding → dropped
      Some(Seq(3.0f)),                // ragged (1-dim) → dropped
      Some(Seq(1.0f, 0.0f, 0.0f))     // ragged (3-dim) → dropped
    ).toDF("embedding")
    val got = Similarity.clusterSilhouette(pts, "embedding", cents)
      .collect().map(_.toSeq).toSet
    assert(got === Set(Seq(0, 1L, 1.0, 9.0, 0.888889)))
    val ragged = intercept[IllegalArgumentException] {
      Similarity.clusterSilhouette(pts, "embedding",
        Seq(0 -> Seq(0.0), 1 -> Seq(10.0, 0.0)))
    }
    assert(ragged.getMessage.contains("dimensionality"))
  }

  test("prefixLmSplit: reconstruction, interior pivot, short docs " +
    "dropped, deterministic under repartitioning") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "x y"), (3L, "solo"), (4L, ""),
      (5L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val out = Mask.prefixLmSplit(docs, col("doc_id"), col("text"))
    val rows = out.collect()
    // docs 3 (1 token) and 4 (0 tokens) have no interior cut
    assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 5L))
    rows.foreach { r =>
      val (n, il, tl) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(il >= 1L && il <= n - 1L && il + tl === n)
      val rebuilt = (r.getString(4) + " " + r.getString(5)).trim
      assert(rebuilt.split("\\s+").length.toLong === n)
    }
    // doc 2 has exactly one interior cut: input="x", target="y"
    val d2 = rows.find(_.getLong(0) == 2L).get
    assert(d2.getString(4) === "x" && d2.getString(5) === "y")
    val a = out.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = Mask.prefixLmSplit(docs.repartition(7), col("doc_id"),
      col("text")).collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a === b)
  }
}
