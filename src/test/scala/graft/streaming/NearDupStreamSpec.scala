package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.NearDup

/** Incremental MinHash-LSH: batch equivalence across arbitrary arrival
  * splits, exactly-once pair emission, state accumulation, and the
  * file-source streaming wrapper. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  // three near-dup families + singletons; pair members are spread across
  // different (id % 3) arrival batches to force the cross-generation path
  private lazy val docs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "the quick brown fox jumps over the lazy dog tonight ok",
    4L -> "completely unrelated text about spark physical plans here",
    5L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    6L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa x",
    8L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa y",
    9L -> "some other singleton document with enough words to shingle"
  ).toDF("id", "text")

  private val params = (3, 8, 2, 0.6) // n, bands, rowsPerBand, threshold

  private def batchPairs = {
    val (n, b, r, t) = params
    NearDup.minhashLshPairs(docs, col("id"), col("text"), n, b, r, t)
      .as[(Long, Long, Double)].collect().toSet
  }

  test("any arrival split accumulates exactly the batch operator's pairs") {
    val (n, b, r, t) = params
    // both verify-side corpus-access shapes must be batch-equivalent:
    // MaxValue pins the full-corpus shingle scan, 0 pins the candidate-id
    // broadcast semi-join (the corpus ≫ batch shape)
    for (ratio <- Seq(Long.MaxValue, 0L);
         splits <- Seq(Seq(0L), Seq(0L, 1L), Seq(0L, 1L, 2L))) {
      val base = Files.createTempDirectory("ndstream").toString
      val results = splits.map { s =>
        NearDupStream.ingestBatch(spark,
          docs.filter(col("id") % splits.length === s),
          s"$base/state", s"$base/sink", n, b, r, t,
          semiJoinCorpusRatio = ratio)
      }
      assert(results.map(_.newDocs).sum === 7)
      val sunk = spark.read.parquet(s"$base/sink")
        .as[(Long, Long, Double)].collect()
      // exactly-once: no pair appears twice across batches
      assert(sunk.length === sunk.toSet.size, "duplicate pair emitted")
      assert(sunk.toSet === batchPairs,
        s"${splits.length}-batch split (ratio=$ratio) diverged from batch")
    }
  }

  test("state accumulates: a later batch pairs with every earlier generation") {
    val (n, b, r, t) = params
    val base = Files.createTempDirectory("ndgen").toString
    // families arrive one member per batch: the third 'alpha' member must
    // pair with BOTH earlier generations via the index, not the self-join
    val r1 = NearDupStream.ingestBatch(spark, docs.filter(col("id") === 5),
      s"$base/state", s"$base/sink", n, b, r, t)
    val r2 = NearDupStream.ingestBatch(spark, docs.filter(col("id") === 6),
      s"$base/state", s"$base/sink", n, b, r, t)
    val r3 = NearDupStream.ingestBatch(spark, docs.filter(col("id") === 8),
      s"$base/state", s"$base/sink", n, b, r, t)
    assert(r1.verifiedPairs === 0)
    assert(r2.verifiedPairs === 1) // (5,6)
    assert(r3.verifiedPairs === 2) // (5,8), (6,8)
    val pairs = spark.read.parquet(s"$base/sink")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((5L, 6L), (5L, 8L), (6L, 8L)))
  }

  test("file-source streaming wrapper: dropped files become increments") {
    val (n, b, r, t) = params
    val base = Files.createTempDirectory("ndq").toString
    val incoming = s"$base/incoming"
    new java.io.File(incoming).mkdirs()
    val q = NearDupStream.start(spark, incoming, s"$base/state",
      s"$base/sink", s"$base/ckpt", n, b, r, t, intervalSeconds = 1)
    try {
      // drop the corpus as two files; the second completes the families
      docs.filter(col("id") <= 5).write.mode("append").parquet(incoming)
      val deadline = System.currentTimeMillis() + 180000
      // explicit schema: while a batch is mid-append the sink dir exists
      // with no committed part files yet — inference would throw
      // UNABLE_TO_INFER_SCHEMA on that transient state, an explicit
      // schema just reads it as empty
      val sinkSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id_a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id_b",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("jaccard",
          org.apache.spark.sql.types.DoubleType)))
      def sunkPairs(): Set[(Long, Long, Double)] =
        if (new java.io.File(s"$base/sink").exists)
          spark.read.schema(sinkSchema).parquet(s"$base/sink")
            .as[(Long, Long, Double)].collect().toSet
        else Set.empty
      docs.filter(col("id") > 5).write.mode("append").parquet(incoming)
      while (sunkPairs() != batchPairs &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)
      assert(sunkPairs() === batchPairs,
        "stream did not converge to the batch pair set")
    } finally q.stop()
  }
}
