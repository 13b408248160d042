package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

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
}
