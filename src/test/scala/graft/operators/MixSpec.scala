package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mixture sampling: budget semantics, determinism, map-side plan. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  // two groups: "big" holds 100 rows x 10 tokens, "small" 5 rows x 10
  private def corpus = spark.range(105).select(
    col("id"),
    when(col("id") < 100, lit("big")).otherwise(lit("small")).as("src"),
    lit(10L).as("w"))

  test("groups under budget keep every row at full rate") {
    val kept = Mix.sampleToBudget(corpus, col("id"), col("src"), col("w"),
      budget = 200L, scale = 10000)
    val small = kept.filter(col("grp") === "small").collect()
    assert(small.length === 5, "small group total 50 <= 200: keep all")
    assert(small.forall(_.getAs[Long]("rate_bp") === 10000L))
  }

  test("oversized groups sample near the budget, never silently explode") {
    val kept = Mix.sampleToBudget(corpus, col("id"), col("src"), col("w"),
      budget = 200L, scale = 10000)
    val bigW = kept.filter(col("grp") === "big")
      .agg(sum("w")).as[Long].collect().head
    // rate = floor(200*10000/1000) = 2000bp → E[kept] = 200, sd ≈ 44
    assert(bigW >= 60 && bigW <= 340, s"kept weight $bigW vs budget 200")
    val rate = kept.filter(col("grp") === "big")
      .select("rate_bp").distinct().as[Long].collect()
    assert(rate.toSeq === Seq(2000L))
  }

  test("deterministic under repartitioning") {
    val a = Mix.sampleToBudget(corpus, col("id"), col("src"), col("w"),
      300L).select("id").as[Long].collect().sorted.toSeq
    val b = Mix.sampleToBudget(corpus.repartition(7), col("id"), col("src"),
      col("w"), 300L).select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("the corpus side joins the rate table by broadcast (map-side keep)") {
    val plan = Mix.sampleToBudget(corpus, col("id"), col("src"), col("w"),
      200L).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate join must broadcast, got:\n$plan")
  }

  test("zero-total-weight group keeps every row at full rate, not by accident") {
    val zw = spark.range(4).select(col("id"),
      when(col("id") < 2, lit("zero")).otherwise(lit("pos")).as("src"),
      when(col("id") < 2, lit(0L)).otherwise(lit(10L)).as("w"))
    val kept = Mix.sampleToBudget(zw, col("id"), col("src"), col("w"), 100L)
    val zero = kept.filter(col("grp") === "zero").collect()
    assert(zero.length === 2, "0-weight group is under any budget: keep all")
    assert(zero.forall(_.getAs[Long]("rate_bp") === 10000L))
  }

  test("negative weight fails the job with a clear message") {
    val neg = Seq((1L, "g", -5L), (2L, "g", 10L)).toDF("id", "src", "w")
    val e = intercept[Exception] {
      Mix.sampleToBudget(neg, col("id"), col("src"), col("w"), 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("negative weight")), s"got: $e")
  }

  test("budget that would overflow Long at the given scale is rejected") {
    val e = intercept[IllegalArgumentException] {
      Mix.sampleToBudget(corpus, col("id"), col("src"), col("w"),
        budget = Long.MaxValue / 100, scale = 10000)
    }
    assert(e.getMessage.contains("overflows"))
  }

  test("assignSplits: deterministic, exhaustive, proportional, stable") {
    val docs = spark.range(2000).toDF("id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Mix.assignSplits(docs, col("id"), fr)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a.keySet === Set("train", "val", "test"))
    assert(a.values.sum === 2000L)
    // hash buckets: expect ~80/10/10 within a loose tolerance
    assert(a("train") > 1400 && a("train") < 1800, s"train=${a("train")}")
    assert(a("val") > 100 && a("val") < 320, s"val=${a("val")}")
    // identical assignment under repartitioning (pure function of id)
    val b = Mix.assignSplits(docs.repartition(7), col("id"), fr)
      .as[(Long, String)].collect().toMap
    val a2 = Mix.assignSplits(docs, col("id"), fr)
      .as[(Long, String)].collect().toMap
    assert(a2 === b)
  }

  test("assignSplits: no shuffle in the plan; bad fractions rejected") {
    val docs = spark.range(10).toDF("id")
    val p = Mix.assignSplits(docs, col("id"), Seq("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"split assignment must not shuffle:\n$p")
    intercept[IllegalArgumentException](
      Mix.assignSplits(docs, col("id"), Seq("a" -> 0.5, "b" -> 0.6)))
    intercept[IllegalArgumentException](
      Mix.assignSplits(docs, col("id"), Seq("a" -> 0.5, "a" -> 0.5)))
    intercept[IllegalArgumentException](
      Mix.assignSplits(docs, col("id"), Seq.empty))
  }

  test("capPerGroup keeps the best n per group, rank is dense best-first") {
    val docs = Seq(
      ("s1", 1L, 0.9), ("s1", 2L, 0.5), ("s1", 3L, 0.7), ("s1", 4L, 0.7),
      ("s2", 5L, 0.1)
    ).toDF("src", "id", "q")
    val kept = Mix.capPerGroup(docs, col("id"), col("src"), col("q"), n = 2)
      .as[(String, Int, Long, Double)].collect().sorted.toSeq
    // s1: 0.9 (id 1) then the 0.7 tie broken toward id 3; s2 under cap
    assert(kept === Seq(("s1", 1, 1L, 0.9), ("s1", 2, 3L, 0.7),
      ("s2", 1, 5L, 0.1)))
  }

  test("capPerGroup pre-prunes map-side via WindowGroupLimit") {
    val docs = spark.range(1000).select(col("id"),
      (col("id") % 3).cast("string").as("src"),
      (col("id") % 17).cast("double").as("q"))
    val plan = Mix.capPerGroup(docs, col("id"), col("src"), col("q"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"row_number<=n must plan a group-limit pre-prune, got:\n$plan")
    intercept[IllegalArgumentException](
      Mix.capPerGroup(docs, col("id"), col("src"), col("q"), 0))
  }

  test("cluster-keyed splits are leakage-free by construction") {
    // split on cluster_rep: members of a cluster MUST share a split,
    // so any verified near-dup pair is split-internal (the q167 matrix
    // goes diagonal). Reps spread across splits like plain ids do.
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("doc_id", "cluster_rep")
    val out = Mix.assignSplits(clusters, col("cluster_rep"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select(col("doc_id"), col("cluster_rep"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byRep = out.groupBy(_._2).values
    assert(byRep.forall(_.map(_._3).distinct.size == 1),
      s"cluster members split apart: ${out.toSeq}")
    // and the assignment equals splitting the rep ids directly
    val repSplit = Mix.assignSplits(
        clusters.select(col("cluster_rep").as("id")).distinct(), col("id"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall { case (_, rep, s) => repSplit(rep) == s })
  }

  // ------------------------- DoReMi-lite reweighting

  // "common" speaks the corpus majority language; "weird" a disjoint
  // vocabulary the corpus-wide unigram LM models badly
  private def doremiDocs = Seq(
    ("common", "a b c a b c a b"),
    ("common", "a b c a b a b c"),
    ("common", "b c a a b c b a"),
    ("weird", "xq yq zq xq yq zq xq yq")
  ).toDF("source", "text")

  test("doremi: the badly-modeled source gains over its token share") {
    val out = Mix.doremiReweight(doremiDocs, col("text"), col("source"),
        eta = 1.0, smoothing = 0.2)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val w = out("weird"); val c = out("common")
    val gainW = w.getAs[Double]("eg_share") / w.getAs[Double]("base_share")
    val gainC = c.getAs[Double]("eg_share") / c.getAs[Double]("base_share")
    assert(w.getAs[Double]("excess") > c.getAs[Double]("excess"),
      "disjoint vocabulary must have the larger excess loss")
    assert(gainW > 1.0 && gainW > gainC,
      s"weird must gain weight: gainW=$gainW gainC=$gainC")
    // both weight columns are distributions (rounded to 6)
    val sumW = out.values.map(_.getAs[Double]("weight")).sum
    val sumE = out.values.map(_.getAs[Double]("eg_share")).sum
    assert(math.abs(sumW - 1.0) < 1e-4, s"weights sum to $sumW")
    assert(math.abs(sumE - 1.0) < 1e-4, s"eg shares sum to $sumE")
  }

  test("doremi: eta=0 degrades to token shares; smoothing=1 to uniform") {
    val flat = Mix.doremiReweight(doremiDocs, col("text"), col("source"),
      eta = 0.0, smoothing = 0.0).collect()
    flat.foreach { r =>
      assert(math.abs(r.getAs[Double]("eg_share") -
        r.getAs[Double]("base_share")) < 1e-5,
        s"eta=0 must keep base shares: $r")
      assert(math.abs(r.getAs[Double]("weight") -
        r.getAs[Double]("base_share")) < 1e-5)
    }
    val uni = Mix.doremiReweight(doremiDocs, col("text"), col("source"),
      eta = 1.0, smoothing = 1.0).collect()
    uni.foreach(r => assert(r.getAs[Double]("weight") === 0.5,
      s"smoothing=1 must be uniform over 2 sources: $r"))
    intercept[IllegalArgumentException](Mix.doremiReweight(
      doremiDocs, col("text"), col("source"), eta = -1, smoothing = 0))
    intercept[IllegalArgumentException](Mix.doremiReweight(
      doremiDocs, col("text"), col("source"), eta = 1, smoothing = 2))
  }

  test("unimax: exact water-filling — small sources cap, the rest share " +
    "the level, allocations conserve the budget") {
    // caps (maxEpochs=1): a=10, b=20, c=100; budget 60 → a and b cap
    // (10·3 ≤ 60, 20·2+10 ≤ 60), c gets θ = (60−30)/1 = 30
    val totals = Seq(("a", 10L), ("b", 20L), ("c", 100L))
      .toDF("grp", "t_total")
    val got = Mix.unimaxFromTotals(totals, budget = 60L, maxEpochs = 1.0)
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._4)).toSeq ===
      Seq(("a", 10.0), ("b", 20.0), ("c", 30.0)))
    assert(got.map(_._4).sum === 60.0) // budget exactly conserved
    assert(got.map(_._5).toSeq === Seq(1.0, 1.0, 0.3)) // epochs
  }

  test("unimax: budget beyond total capacity caps everything (underfill); " +
    "fractional epoch caps bind") {
    val totals = Seq(("a", 10L), ("b", 20L)).toDF("grp", "t_total")
    val over = Mix.unimaxFromTotals(totals, budget = 1000L, maxEpochs = 2.0)
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(over.map(_._4).toSeq === Seq(20.0, 40.0)) // alloc = cap
    assert(over.map(_._5).toSeq === Seq(2.0, 2.0))   // epochs = maxEpochs
    val frac = Mix.unimaxFromTotals(totals, budget = 14L, maxEpochs = 0.5)
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
    // caps 5 and 10; a caps (5·2 ≤ 14), b gets θ = 9 < its cap 10
    assert(frac.map(_._4).toSeq === Seq(5.0, 9.0))
    intercept[IllegalArgumentException](
      Mix.unimaxFromTotals(totals, budget = 0L, maxEpochs = 1.0))
    intercept[IllegalArgumentException](
      Mix.unimaxFromTotals(totals, budget = 10L, maxEpochs = 0.0))
  }

  test("rebalanceToTarget: limiting category kept whole, rates hit " +
    "T*t/n, absent target fails fast") {
    import org.apache.spark.sql.functions._
    val df = ((1 to 8).map(i => (i.toLong, "a")) ++
      Seq((9L, "b"), (10L, "b"))).toDF("id", "cat")
    val panel = Mix.rebalanceToTarget(df, col("id"), col("cat"),
      Seq("a" -> 0.5, "b" -> 0.5), scale = 1000000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    // T = min(8/.5, 2/.5) = 4 -> rate_a = 4*.5/8 = 0.25, rate_b = 1
    assert(panel("a")._1 === 8L && panel("a")._3 === 250000L)
    assert(panel("b") === ((2L, 0.5, 1000000L, 2L)))
    val kept = Mix.rebalanceSample(df, col("id"), col("cat"),
      Seq("a" -> 0.5, "b" -> 0.5), scale = 1000000)
    // b is limiting: every b row survives; kept ids are a subset
    assert(kept.filter(col("cat") === "b").count() === 2L)
    assert(kept.join(df, Seq("id"), "left_anti").count() === 0L)
    val err = intercept[org.apache.spark.SparkException] {
      Mix.rebalanceToTarget(df, col("id"), col("cat"),
        Seq("a" -> 0.5, "zz" -> 0.5)).collect()
    }
    assert(err.getMessage.contains("absent"))
  }
}
