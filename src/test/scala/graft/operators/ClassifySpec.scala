package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hashed linear classifier inference: hand-computed scores, no-join
  * plan, determinism, and the empty-doc exclusion. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  test("score matches the hand-computed sigmoid of the bucket-weight mean") {
    // D=1: every token hits bucket 0 — score = sigmoid(bias + w0)
    val docs = Seq((1L, "a b c"), (2L, "xyz")).toDF("doc_id", "text")
    val got = Classify.hashedLinearScore(docs, col("doc_id"), col("text"),
      weights = Seq(0.5), bias = -0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expected = math.rint(1.0 / (1.0 + math.exp(-0.25)) * 1e4) / 1e4
    assert(got(1L) === ((3L, expected)))
    assert(got(2L) === ((1L, expected)))
  }

  test("docs with no tokens are excluded, not scored") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "tok")).toDF("doc_id", "text")
    val ids = Classify.hashedLinearScore(docs, col("doc_id"), col("text"),
      Seq(0.1, 0.2), 0.0).select("id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }

  test("model rides the plan: no join, no extra shuffle beyond the combine") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = Classify.hashedLinearScore(docs, col("doc_id"), col("text"),
      Seq.fill(64)(0.01), 0.0).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"weights must be plan literals:\n$plan")
  }

  test("deterministic under repartitioning (decimal-exact accumulation)") {
    val rng = new scala.util.Random(3)
    val docs = (1L to 200L).map(i =>
      (i, Seq.fill(rng.nextInt(30) + 1)(s"t${rng.nextInt(50)}").mkString(" ")))
      .toDF("doc_id", "text")
    val ws = Seq.fill(64)(math.rint(rng.nextGaussian() * 1e6) / 1e6)
    val a = Classify.hashedLinearScore(docs, col("doc_id"), col("text"), ws, 0.2)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = Classify.hashedLinearScore(docs.repartition(13), col("doc_id"),
      col("text"), ws, 0.2)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a === b)
  }

  test("scoreDrift: exact bin shares and JS terms, one-sided bins " +
    "without any epsilon hack") {
    // ref bins {0: 2, 5: 2}; cur bins {0: 1, 9: 3} — bin 5 empties in
    // cur, bin 9 is new in cur; identical-histogram drift must be 0.
    val ref = Seq(0.05, 0.06, 0.55, 0.56).toDF("score")
    val cur = Seq(0.05, 0.95, 0.96, 0.99).toDF("score")
    val got = Classify.scoreDrift(ref, cur, col("score"))
      .orderBy("bin")
      .as[(Int, Long, Long, Double, Double, Double, Long)].collect()
    def js(p: Double, q: Double): Long = {
      val m = (p + q) / 2.0
      val t = (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
        (if (q > 0) 0.5 * q * math.log(q / m) else 0.0)
      math.rint(t * 1e9).toLong
    }
    assert(got === Seq(
      (0, 2L, 1L, 0.5, 0.25, -0.25, js(0.5, 0.25)),
      (5, 2L, 0L, 0.5, 0.0, -0.5, js(0.5, 0.0)),
      (9, 0L, 3L, 0.0, 0.75, 0.75, js(0.0, 0.75))))
    val same = Classify.scoreDrift(ref, ref, col("score"))
      .select("js_e9").as[Long].collect()
    assert(same.forall(_ === 0L))
  }

  test("predictionChurn: directional flip counts and rate, per group") {
    val joined = Seq(
      ("A", true, true), ("A", true, false), ("A", false, true),
      ("A", false, false),                       // A: 1 exit, 1 enter of 4
      ("B", true, true), ("B", true, true)) // B: no churn
      .toDF("grp", "ka", "kb")
    val got = Classify.predictionChurn(joined, col("ka"), col("kb"),
        col("grp"))
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("A") === ("A", 4L, 2L, 2L, 1L, 1L, 0.5))
    assert(got("B") === ("B", 2L, 2L, 2L, 0L, 0L, 0.0))
  }

  test("rankNormalize equals percent_rank(): ties share, singletons read 0") {
    // A: scores 1,2,2,5 → pr 0, 1/3, 1/3, 1; B: one row → 0
    val df = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 2.0),
      (4L, "A", 5.0), (5L, "B", 9.0)).toDF("id", "grp", "s")
    val got = Classify.rankNormalize(df, col("id"), col("s"), col("grp"))
      .as[(Long, String, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "A", 1.0, 0.0), (2L, "A", 2.0, 0.333333),
      (3L, "A", 2.0, 0.333333), (4L, "A", 5.0, 1.0), (5L, "B", 9.0, 0.0)))
    // the count-table CDF equals Spark's own window on a bigger frame
    val big = spark.range(500).select(col("id"),
      concat(lit("g"), pmod(col("id"), lit(7))).as("grp"),
      round(pmod(col("id") * 37, lit(23)).cast("double") / 7.0, 6).as("s"))
    val viaOp = Classify.rankNormalize(big, col("id"), col("s"), col("grp"))
      .select(col("id"), col("pr"))
      .as[(Long, Double)].collect().toMap
    val viaWin = big.select(col("id"),
        round(org.apache.spark.sql.functions.percent_rank().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
            .orderBy(col("s"))), 6).as("pr"))
      .as[(Long, Double)].collect().toMap
    assert(viaOp === viaWin)
  }
}
