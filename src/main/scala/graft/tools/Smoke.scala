package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke harness: drives the library surface on real testdata.
  * Usage: sbt "runMain graft.tools.Smoke [sfDir]"
  * Not part of the driver contract — Verify/Bench are; this is the
  * fast local loop for eyeballing operator output + plans.
  *
  * One-off measurement probes live behind a leading mode arg so the
  * default invocation always exercises the CORE operator surface
  * (the r17 q251 sweep briefly replaced it wholesale — r17 ADVICE):
  * `runMain graft.tools.Smoke q251 [sfDir]` re-runs the coarse-ceiling
  * sweep + served-hits comparison from SCALE.md round-17.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val (mode, sfDir) = args.toList match {
      case "q251" :: rest => ("q251", rest.headOption.getOrElse("/root/testdata/sf0.001"))
      case "q242cc" :: rest => ("q242cc", rest.headOption.getOrElse("/root/testdata/sf0.1"))
      case other => ("smoke", other.headOption.getOrElse("/root/testdata/sf0.001"))
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    if (mode == "q242cc") {
      // r19 VERDICT #4 evidence: q242's connectedComponents call uses the
      // DEFAULT localMaxEdges=1M driver union-find gate. This probe counts
      // the LSH candidate pairs over the UNFILTERED corpus — a strict
      // superset of q242's post-dedup edge set (dropping docs only drops
      // pairs) — so a count <= 1M proves q242's CC runs the 3-job driver
      // small regime, not the iterative rounds.
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val n = graft.operators.NearDup.minhashLshPairs(docs, col("doc_id"),
        col("text"), n = 3, bands = 16, rowsPerBand = 2, threshold = 0.8).count()
      println(s"q242cc: LSH pair upper bound on $sfDir = $n (gate 1000000)")
      spark.stop()
      return
    }

    if (mode == "q251") {
      println(s"== q251 coarse-ceiling sweep on $sfDir ==")
      graft.queries.TestdataQueries.q251CeilingTable(spark, sfDir)
        .orderBy("n_lists").show(20, false)
      println(s"== served hits: q248 (8,4) vs q252 (32,16) on $sfDir ==")
      graft.queries.TestdataQueries.q248HitsTable(spark, sfDir)
        .agg(sum(col("hits")).as("q248_hits_sum")).show()
      graft.queries.TestdataQueries.q248HitsTable(spark, sfDir,
          nLists = 32, nProbe = 16)
        .agg(sum(col("hits")).as("q252_hits_sum")).show()
      spark.stop()
      return
    }

    import graft.functions.TextExprs
    import graft.operators.NearDup
    import graft.sources.Tables

    val docs = Tables.documents(spark, sfDir)
    println("== documents sample ==")
    docs.show(3, 60)

    println("== wordShingles / tokens on documents (incl. empty-doc guard) ==")
    docs.select(col("doc_id"), TextExprs.tokenCount(col("text")).as("n_tok"),
        size(TextExprs.wordShingles(col("text"), 3)).as("n_shingles"))
      .orderBy("doc_id").show(5)
    spark.range(1).select(
      size(TextExprs.wordShingles(lit(""), 3)).as("empty_doc_shingles"),
      size(TextExprs.wordShingles(lit("a b"), 3)).as("short_doc_shingles")).show()

    println("== simhash on documents ==")
    docs.select(col("doc_id"), NearDup.simhash(col("text")).as("simhash"))
      .orderBy("doc_id").show(5)

    println("== minhashLshPairs (id-only band join) ==")
    val pairs = NearDup.minhashLshPairs(docs, col("doc_id"), col("text"),
      n = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
    pairs.show(10)
    println(s"pair count: ${pairs.count()}")

    println("== SparkEntry.entry (OMM flagship, driver smoke) ==")
    val entry = graft.SparkEntry.entry(spark)
    entry.show(10, 40)
    println(s"entry rows: ${entry.count()}")

    println("== heavyHitters (MG candidates + exact recount) ==")
    graft.operators.Frequent.heavyHitters(
      docs.select(explode(TextExprs.tokens(col("text"))).as("item")),
      col("item"), minShare = 0.02, counters = 256)
      .orderBy(desc("cnt")).show(10)

    println("== Shard.byBudget (distributed prefix-sum sharding) ==")
    graft.operators.Shard.byBudget(
      docs.select(col("doc_id"),
        TextExprs.tokenCount(col("text")).cast("long").as("n_tok")),
      "doc_id", "n_tok", budget = 2000L)
      .groupBy("shard").count().orderBy("shard").show(5)

    println("== Layout.zValue (Morton key sample) ==")
    Tables.lineitem(spark, sfDir).select(col("l_partkey"), col("l_suppkey"),
      graft.operators.Layout.zValue(col("l_partkey"), col("l_suppkey"),
        1L, 2000L, 1L, 100L, bits = 8).as("z"))
      .orderBy("z").show(5)

    println("== F7 flag: cancellation-types-only filter ==")
    import graft.omm.{CancellationPipeline => P, OmmFixtures => F}
    val tables = P.loadTables(spark, F.dir)
    val all = P.snapshot(tables, P.FromNow, F.now, F.today, F.lookback)
    val strict = P.snapshot(tables, P.FromNow, F.now, F.today,
      F.lookback, cancellationTypesOnly = true)
    println(s"F7 off: ${all.count()} rows; F7 on: ${strict.count()} rows " +
      "(drops the UNKNOWN_TYPE/WEIRD_AD_TYPE fixtures)")

    spark.stop()
  }
}
