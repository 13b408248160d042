package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Hand-computable PQ golden case: 4-dim vectors, 2 subspaces of 2 dims,
  * 2 seed centroids — codes and distortions verifiable on paper. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  // seed rows 0 and 1 are the codebook (code 0 → row 0, code 1 → row 1)
  private lazy val vecs = Seq(
    (0L, Seq(0.0, 0.0, 10.0, 10.0)),
    (1L, Seq(4.0, 4.0, 20.0, 20.0)),
    // sub1=(1,1): closer to (0,0) → code 0, dist 2; sub2=(19,19): closer
    // to (20,20) → code 1, dist 2 → distortion 4
    (2L, Seq(1.0, 1.0, 19.0, 19.0)),
    // equidistant in sub1 ((2,2): both dist 8) → tie broken to code 0;
    // sub2=(15,15): dist 50 both → tie → code 0
    (3L, Seq(2.0, 2.0, 15.0, 15.0))
  ).toDF("vec_id", "embedding")

  private lazy val cb = Quantize.seedCodebook(vecs, col("vec_id"),
    col("embedding"), Seq(0L, 1L))

  test("codes and distortion match the hand computation") {
    val out = Quantize.pqEncode(vecs, col("vec_id"), col("embedding"),
        cb, m = 2, dim = 4)
      .select($"id", $"c0", $"c1", $"distortion")
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) === ((0L, 0, 0, 0.0)), "seed row encodes to itself")
    assert(out(1L) === ((1L, 1, 1, 0.0)), "seed row encodes to itself")
    assert(out(2L) === ((2L, 0, 1, 4.0)))
    assert(out(3L) === ((3L, 0, 0, 58.0)), "ties resolve to the lower code")
  }

  test("ADC distance equals the sum of per-subspace exact distances to " +
    "the assigned centroids") {
    val codes = Quantize.pqEncode(vecs, col("vec_id"), col("embedding"),
      cb, m = 2, dim = 4).drop("distortion")
    val adc = Quantize.pqAdcTopK(codes, vecs.filter($"vec_id" === 2L),
        "vec_id", "embedding", cb, m = 2, dim = 4, k = 3)
      .select($"neighbor_id", $"adc_dist").as[(Long, Double)].collect().toMap
    // query (1,1,19,19) vs row 3's codes (0,0) → centroids ((0,0),(10,10)):
    // (1+1) + (81+81) = 164
    assert(adc(3L) === 164.0)
    // vs row 1's codes (1,1) → centroids ((4,4),(20,20)): (9+9)+(1+1) = 20
    assert(adc(1L) === 20.0)
  }

  test("misconfigured subspaces fail loudly") {
    intercept[IllegalArgumentException] {
      Quantize.pqEncode(vecs, col("vec_id"), col("embedding"), cb,
        m = 3, dim = 4)
    }
    intercept[IllegalArgumentException] {
      Quantize.seedCodebook(vecs, col("vec_id"), col("embedding"),
        Seq(0L, 999L))
    }
  }

  // ------------------------------------------------- IVF-PQ (IVFADC)

  private def codesWithList(
      embs: org.apache.spark.sql.DataFrame,
      pq: Seq[(Int, Seq[Double])], coarse: Seq[(Int, Seq[Double])],
      m: Int, dim: Int): org.apache.spark.sql.DataFrame =
    Quantize.pqEncode(embs, col("vec_id"), col("embedding"), pq, m, dim,
        keep = Seq(Quantize.ivfListCol(col("embedding"), coarse)
          .as("list_id")))
      .drop("distortion")

  test("ivfPqTopK golden: nProbe=1 scans only the query's nearest list") {
    // coarse = rows 0/1 full-dim. Query row 2 → list 1 (dist 20 vs 164);
    // corpus assignment: 0→l0, 1→l1, 2→l1, 3→tie(58,58)→l0. So the only
    // candidate is row 1, at ADC 20 (verified in the pqAdcTopK test).
    val out = Quantize.ivfPqTopK(codesWithList(vecs, cb, cb, 2, 4),
        vecs.filter($"vec_id" === 2L), "vec_id", "embedding",
        cb, cb, m = 2, dim = 4, nProbe = 1, k = 3)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_dist")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(out === Seq((2L, 1, 1L, 20.0)))
  }

  test("ivfPqTopK at nProbe = nLists is row-identical to the full ADC scan") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pq = Quantize.seedCodebook(embs, col("vec_id"), col("embedding"),
      10L to 25L)
    val coarse = Quantize.seedCodebook(embs, col("vec_id"), col("embedding"),
      30L to 37L)
    val queries = embs.filter($"vec_id" < 5)
    val ivf = Quantize.ivfPqTopK(codesWithList(embs, pq, coarse, 8, 64),
        queries, "vec_id", "embedding", coarse, pq, m = 8, dim = 64,
        nProbe = coarse.size, k = 3)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val full = Quantize.pqAdcTopK(
        Quantize.pqEncode(embs, col("vec_id"), col("embedding"), pq, 8, 64)
          .drop("distortion"),
        queries, "vec_id", "embedding", pq, m = 8, dim = 64, k = 3)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(ivf.nonEmpty && ivf === full)
  }

  test("ivfPqTopK plan: broadcast equi-join on list_id, no cartesian") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pq = Quantize.seedCodebook(embs, col("vec_id"), col("embedding"),
      10L to 25L)
    val coarse = Quantize.seedCodebook(embs, col("vec_id"), col("embedding"),
      30L to 37L)
    val plan = Quantize.ivfPqTopK(codesWithList(embs, pq, coarse, 8, 64),
        embs.filter($"vec_id" < 5), "vec_id", "embedding",
        coarse, pq, m = 8, dim = 64, nProbe = 2, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"IVF probe must be an equi-join, not a cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("list_id"),
      s"expected a broadcast hash join keyed on list_id:\n$plan")
  }
}
