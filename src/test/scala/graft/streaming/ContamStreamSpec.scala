package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Contamination

/** Incremental decontamination: batch equivalence for any arrival split
  * of EITHER side (docs and benchmark grams each count a hit exactly
  * once, when the later side arrives), idempotent benchmark
  * re-registration, and crash-safe state accumulation. */
class ContamStreamSpec extends SparkSpec {
  import spark.implicits._

  // corpus docs: one fully contaminated (copy of bench 100), one half
  // (shares a 4-token run with bench 101), two clean, one empty
  private lazy val corpus = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta",
    2L -> "alpha beta gamma delta completely different tail here now",
    3L -> "nothing in common with any benchmark document at all",
    4L -> "spark physical plans and adaptive query execution notes",
    5L -> ""
  ).toDF("id", "text")

  private lazy val bench = Seq(
    100L -> "alpha beta gamma delta epsilon zeta eta theta",
    101L -> "unrelated benchmark prose that matches nothing in corpus"
  ).toDF("id", "text")

  private def oneShot = Contamination.overlapVsBenchmark(
      corpus, bench, col("id"), col("text"), n = 3)
    .as[(Long, Long, Long, Boolean)].collect().toSet

  test("any arrival split of docs AND benchmark equals the batch operator") {
    for (nSplits <- Seq(1, 2, 3)) {
      val state = Files.createTempDirectory("contamstream").toString
      (0 until nSplits).foreach { b =>
        ContamStream.ingestBatch(spark,
          newDocs = corpus.filter(col("id") % nSplits === b),
          newBench = bench.filter(col("id") % nSplits === b),
          stateDir = state, n = 3)
      }
      val got = ContamStream.contamination(spark, state)
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(got === oneShot, s"$nSplits-way split diverged from batch")
    }
  }

  test("gram index is hive-bucketed and the bucket-pruned probe is " +
    "exact at any nBuckets (incl. 1 = no pruning possible)") {
    for (nb <- Seq(1, 7, 64)) {
      val state = Files.createTempDirectory("contamstream").toString
      // docs first, benchmark second — forces the bucket-pruned
      // old-docs probe to produce EVERY hit
      ContamStream.ingestBatch(spark, corpus, bench.limit(0), state,
        n = 3, nBuckets = nb)
      ContamStream.ingestBatch(spark, corpus.limit(0), bench, state,
        n = 3, nBuckets = nb)
      val got = ContamStream.contamination(spark, state)
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(got === oneShot, s"nBuckets=$nb diverged from batch")
      val dirs = new java.io.File(s"$state/grams").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("b="))
      assert(dirs.nonEmpty && dirs.forall { d =>
        val v = d.stripPrefix("b=").toInt; v >= 0 && v < nb
      }, s"expected b=<0..${nb - 1}> partition dirs, got ${dirs.toSeq}")
    }
  }

  test("benchmark-after-docs: hits land when the gram side arrives late") {
    val state = Files.createTempDirectory("contamstream").toString
    // all docs first, benchmark only in the second batch
    ContamStream.ingestBatch(spark, corpus, bench.limit(0), state, n = 3)
    val preBench = ContamStream.contamination(spark, state)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(preBench.forall(_._3 === 0L), "overlap before any benchmark")
    ContamStream.ingestBatch(spark, corpus.limit(0), bench, state, n = 3)
    val got = ContamStream.contamination(spark, state)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === oneShot)
  }

  test("re-registering the same benchmark suite changes nothing") {
    val state = Files.createTempDirectory("contamstream").toString
    ContamStream.ingestBatch(spark, corpus, bench, state, n = 3)
    val r = ContamStream.ingestBatch(spark, corpus.limit(0), bench, state,
      n = 3)
    assert(r.newBenchGrams === 0L && r.newHits === 0L,
      "duplicate benchmark registration must be a no-op")
    val got = ContamStream.contamination(spark, state)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === oneShot)
  }

  test("empty-doc rows produce no stats row (the batch operator's grain)") {
    val state = Files.createTempDirectory("contamstream").toString
    ContamStream.ingestBatch(spark, corpus, bench, state, n = 3)
    val ids = ContamStream.contamination(spark, state)
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 3L, 4L)) // doc 5 is empty: no shingles
  }

  test("adaptive layout: starts at 1 bucket, grows via rebucket, and the " +
    "grown probe is still exact") {
    val state = Files.createTempDirectory("contamstream").toString
    // docs only, two batches, 1-byte bucket target: the first batch
    // seeds at modulus 1, the post-append rebucket grows the layout, the
    // second batch appends INTO the grown layout
    ContamStream.ingestBatch(spark, corpus.filter(col("id") <= 3),
      bench.limit(0), state, n = 3, bucketTargetBytes = 1L, maxBuckets = 8)
    val grown = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$state/grams/_graft_nbuckets"))).trim.toInt
    assert(grown === 8, s"1-byte target must grow to the 8-bucket cap")
    ContamStream.ingestBatch(spark, corpus.filter(col("id") > 3),
      bench.limit(0), state, n = 3, bucketTargetBytes = 1L, maxBuckets = 8)
    val dirs = new java.io.File(s"$state/grams").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("b="))
    assert(dirs.forall { d =>
      val v = d.stripPrefix("b=").toInt; v >= 0 && v < 8
    }, s"grown layout must be b=<0..7>, got ${dirs.toSeq}")
    // benchmark arrives LAST: every hit comes from the bucket-pruned
    // old-docs probe against the grown layout
    ContamStream.ingestBatch(spark, corpus.limit(0), bench, state,
      n = 3, bucketTargetBytes = 1L, maxBuckets = 8)
    val got = ContamStream.contamination(spark, state)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === oneShot, "post-rebucket pruned probe diverged")
  }

  test("modulus marker survives the stream's state maintenance; a pinned " +
    "caller that disagrees with the layout is rejected") {
    val state = Files.createTempDirectory("contamstream").toString
    // force growth AND per-batch compaction in the same stream
    (0 until 3).foreach { b =>
      ContamStream.ingestBatch(spark,
        newDocs = corpus.filter(col("id") % 3 === b),
        newBench = bench.filter(col("id") % 3 === b),
        stateDir = state, n = 3, compactAfterFiles = 1,
        bucketTargetBytes = 1L, maxBuckets = 8)
    }
    val marker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$state/grams/_graft_nbuckets"))).trim
    assert(marker === "8", "compaction must carry the layout marker")
    val got = ContamStream.contamination(spark, state)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === oneShot)
    val e = intercept[IllegalArgumentException] {
      ContamStream.ingestBatch(spark, corpus.limit(0), bench, state,
        n = 3, nBuckets = 64)
    }
    assert(e.getMessage.contains("nBuckets=8"),
      s"pinned-modulus mismatch must name the live layout: ${e.getMessage}")
  }

  test("crash residue between the first marker stamp and the first data " +
    "append (marker-only grams dir) is recovered, not tripped over") {
    val state = Files.createTempDirectory("contamstream_mk").toString
    // the residue the marker-first stamp order can leave: a grams dir
    // holding ONLY the modulus marker, no parquet
    graft.operators.SketchState.writeMarker(spark, s"$state/grams",
      "_graft_nbuckets", "8")
    // pinned caller must still match the marker
    intercept[IllegalArgumentException] {
      ContamStream.ingestBatch(spark, corpus, bench, state, n = 3,
        nBuckets = 4)
    }
    // an adaptive caller resumes at the marked modulus and the stream
    // converges to the batch answer — benchmark arriving LAST exercises
    // the old-docs probe against the recovered layout
    ContamStream.ingestBatch(spark, corpus, bench.limit(0), state, n = 3)
    ContamStream.ingestBatch(spark, corpus.limit(0), bench, state, n = 3)
    val got = ContamStream.contamination(spark, state)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === oneShot, "marker-only residue broke batch equivalence")
    assert(graft.operators.SketchState.readMarker(spark, s"$state/grams",
      "_graft_nbuckets") === Some("8"), "recovered modulus must persist")
  }

  test("an adaptive open REFUSES a non-empty unmarked gram index instead " +
    "of guessing modulus 1 against an unknown layout") {
    val state = Files.createTempDirectory("contamstream_um").toString
    // fabricate pre-marker-era residue: partitioned gram data, no marker
    corpus.select(col("id"), xxhash64(col("text")).as("h1"),
        xxhash64(col("text"), lit(1)).as("h2"))
      .withColumn("b", pmod(col("h1"), lit(8L)).cast("int"))
      .write.mode("overwrite").partitionBy("b").parquet(s"$state/grams")
    val e = intercept[IllegalArgumentException] {
      ContamStream.ingestBatch(spark, corpus, bench, state, n = 3)
    }
    assert(e.getMessage.contains("_graft_nbuckets"),
      s"refusal must name the missing marker, got: ${e.getMessage}")
  }

  test("compaction keeps results identical") {
    val state = Files.createTempDirectory("contamstream").toString
    (0 until 3).foreach { b =>
      ContamStream.ingestBatch(spark,
        newDocs = corpus.filter(col("id") % 3 === b),
        newBench = bench.filter(col("id") % 3 === b),
        stateDir = state, n = 3, compactAfterFiles = 1)
    }
    val got = ContamStream.contamination(spark, state)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === oneShot)
  }
}
