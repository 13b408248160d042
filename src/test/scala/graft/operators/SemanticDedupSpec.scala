package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic dedup: keep/drop flags against the pair relation it rides,
  * plus the plane-independent exact-duplicate case. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vec(axis: Int): Seq[Float] =
    Seq.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)

  // three identical copies of A, two of B, a singleton C — all mutually
  // orthogonal across families, so cross-family cosine is exactly 0 and
  // within-family cosine exactly 1 REGARDLESS of the LSH planes (identical
  // vectors always share a bucket; orthogonal pairs never pass 0.4)
  private val fams = Seq(
    1L -> vec(0), 5L -> vec(0), 9L -> vec(0),
    2L -> vec(1), 7L -> vec(1),
    4L -> vec(2))

  test("only the smallest id of each identical-vector family is kept") {
    val out = Similarity.semanticDedup(
        fams.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"),
        dim = dim, bits = 3, seed = 11L, threshold = 0.4)
      .as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> true, 5L -> false, 9L -> false,
      2L -> true, 7L -> false, 4L -> true))
  }

  test("row count is stable and the flag agrees with the pair relation") {
    // pseudo-random corpus: the flag must equal "no smaller-id partner in
    // embeddingNearDupPairs" for every row, whatever the buckets did
    val embs = spark.range(40).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => sin(col("id") % 7 + i * 3).cast("float")).as("embedding"))
    val out = Similarity.semanticDedup(embs, col("vec_id"),
      col("embedding"), dim = dim, bits = 2, seed = 3L, threshold = 0.9)
    assert(out.count() === 40L)
    val dropped = out.filter(!col("kept")).select("vec_id")
      .as[Long].collect().toSet
    val pairDrops = NearDup.embeddingNearDupPairs(embs, col("vec_id"),
        col("embedding"), dim = dim, bits = 2, seed = 3L, threshold = 0.9)
      .select("id_b").as[Long].collect().toSet
    assert(dropped === pairDrops)
    assert(!dropped.contains(0L)) // no smaller id exists for the minimum
  }
}
