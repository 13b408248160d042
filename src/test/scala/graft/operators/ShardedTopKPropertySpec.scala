package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style invariants for the sharded exact top-k and the eval
  * metrics added with it, over seeded random inputs:
  *  - shardedTopK(qs, cs) ≡ bruteForceTopK for RANDOM shard counts,
  *    sizes, and dimensions (the fixture spec pins one configuration;
  *    this sweeps the space the cost model ranges over)
  *  - averagePrecision ≡ an independent driver-side reference
  *    (thresholds enumerated in plain scala) on random score/label sets
  *    with heavy ties
  */
class ShardedTopKPropertySpec extends SparkSpec {
  import spark.implicits._

  test("shardedTopK == bruteForceTopK over random sizes, dims, shard " +
      "counts (10 seeded trials)") {
    val rng = new scala.util.Random(1234)
    for (t <- 1 to 10) {
      val dim = Seq(2, 4, 8)(rng.nextInt(3))
      val nQ = rng.nextInt(25) + 5
      val nC = rng.nextInt(40) + 10
      val k = rng.nextInt(6) + 1
      val qs = rng.nextInt(5) + 1
      val cs = rng.nextInt(7) + 1
      def side(n: Int, base: Long) = (0 until n).map { i =>
        // occasional zero-norm vector (null cosine path)
        val v = if (rng.nextInt(12) == 0) Array.fill(dim)(0.0f)
          else Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)
        (base + i, v)
      }.toDF("vec_id", "embedding")
      // overlapping id spaces ~half the time: the self-pair exclusion
      // must behave identically in both plans
      val cBase = if (rng.nextBoolean()) 0L else 1000L
      val queries = side(nQ, 0L)
      val corpus = side(nC, cBase)
      val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", k).collect().map(_.toSeq).toSet
      val sharded = Similarity.shardedTopK(corpus, queries,
        "vec_id", "embedding", k, qs, cs).collect().map(_.toSeq).toSet
      assert(sharded === brute,
        s"trial $t: dim=$dim nQ=$nQ nC=$nC k=$k shards=${qs}x$cs")
    }
  }

  test("averagePrecision == driver-side threshold-sum reference on " +
      "random tied score sets (15 seeded trials)") {
    val rng = new scala.util.Random(99)
    for (t <- 1 to 15) {
      // coarse score grid -> heavy ties, the case the threshold
      // formulation exists for
      val n = rng.nextInt(200) + 20
      val rows = (0 until n).map { _ =>
        (rng.nextInt(8) / 8.0, if (rng.nextInt(3) == 0) 1 else 0)
      }
      val df = rows.toDF("score", "y")
      val got = Classify.averagePrecision(df, col("score"), col("y")).head()
      // independent reference: enumerate distinct thresholds descending
      val nPos = rows.count(_._2 == 1).toLong
      val byScore = rows.groupBy(_._1).map { case (s, rs) =>
        (s, rs.count(_._2 == 1).toLong, rs.size.toLong)
      }.toSeq.sortBy(-_._1)
      var cumTp = 0L
      var cumN = 0L
      var accE9 = 0L
      byScore.foreach { case (_, np, all) =>
        cumTp += np; cumN += all
        val term = np.toDouble * (cumTp.toDouble / cumN.toDouble)
        accE9 += math.rint(term * 1e9).toLong
      }
      assert(got.getLong(0) === nPos, s"trial $t n_pos")
      if (nPos == 0) assert(got.isNullAt(2), s"trial $t null ap")
      else {
        // replicate the operator's exact value path: DECIMAL(38,9) sum
        // -> double -> one division -> snap 6
        val num = new java.math.BigDecimal(accE9).movePointLeft(9)
          .doubleValue()
        val expect = math.rint(num / nPos.toDouble * 1e6) / 1e6
        assert(got.getDouble(2) === expect, s"trial $t ap")
      }
    }
  }
}
