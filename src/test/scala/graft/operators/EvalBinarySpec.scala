package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Filter evaluation: hand-checked confusion counts and ratios. */
class EvalBinarySpec extends SparkSpec {
  import spark.implicits._

  // scores: y=1 at .9/.6/.2 ; y=0 at .8/.4/.1
  private def scored = Seq(
    (0.9, 1), (0.6, 1), (0.2, 1), (0.8, 0), (0.4, 0), (0.1, 0)
  ).toDF("score", "y")

  test("confusion counts and ratios at a mid threshold") {
    val r = Classify.evalBinary(scored, col("score"), col("y"), Seq(0.5))
      .head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((2L, 1L, 1L, 2L)))
    assert(r.getDouble(5) === 0.666667) // precision 2/3
    assert(r.getDouble(6) === 0.666667) // recall 2/3
    assert(r.getDouble(7) === 0.666667) // f1
  }

  test("one row per threshold; extreme thresholds degenerate correctly") {
    val out = Classify.evalBinary(scored, col("score"), col("y"),
      Seq(0.0, 0.95)).collect().sortBy(_.getDouble(0))
    assert(out.length === 2)
    // t=0: everything predicted positive → recall 1, tn=0
    assert(out(0).getDouble(6) === 1.0)
    assert(out(0).getLong(4) === 0L)
    // t=0.95: nothing predicted positive → precision null, recall 0
    assert(out(1).isNullAt(5))
    assert(out(1).getDouble(6) === 0.0)
  }

  test("aucRoc matches the hand-computed pair statistic, ties at 0.5") {
    // pairs: pos {.9,.6,.2} x neg {.8,.4,.1}: wins = (9>8,9>4,9>1,
    // 6>4,6>1, 2>1) = 6 of 9 → AUC = 6/9
    val r = Classify.aucRoc(scored, col("score"), col("y")).head()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert(r.getDouble(2) === 0.666667)
    // all-tied scores → AUC exactly 0.5
    val tied = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0))
      .toDF("score", "y")
    assert(Classify.aucRoc(tied, col("score"), col("y"))
      .head().getDouble(2) === 0.5)
    // single class → null
    val one = Seq((0.9, 1), (0.1, 1)).toDF("score", "y")
    assert(Classify.aucRoc(one, col("score"), col("y")).head().isNullAt(2))
  }

  test("aucRocByGroup: groups score independently, slices match global") {
    val byG = scored.withColumn("g", lit("only"))
    val g = Classify.aucRocByGroup(byG, col("score"), col("y"), col("g"))
      .head()
    assert((g.getLong(1), g.getLong(2), g.getDouble(3)) ===
      ((3L, 3L, 0.666667)))
    // a perfectly-ranked group beside a random one
    val two = Seq(
      ("good", 0.9, 1), ("good", 0.8, 1), ("good", 0.2, 0),
      ("bad", 0.5, 1), ("bad", 0.5, 0)
    ).toDF("g", "score", "y")
    val out = Classify.aucRocByGroup(two, col("score"), col("y"),
      col("g")).collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("good") === 1.0)
    assert(out("bad") === 0.5)
  }

  test("averagePrecisionByGroup: a single group equals the global AP, " +
      "slices score independently") {
    val rows = Seq((0.9, 1), (0.8, 0), (0.8, 1), (0.7, 0), (0.5, 1))
      .toDF("score", "y")
    val global = Classify.averagePrecision(rows, col("score"), col("y"))
      .head().getDouble(2)
    val one = Classify.averagePrecisionByGroup(
      rows.withColumn("g", lit("only")), col("score"), col("y"), col("g"))
      .head()
    assert(one.getDouble(3) === global)
    val two = Seq(
      ("good", 0.9, 1), ("good", 0.8, 1), ("good", 0.2, 0),
      ("bad", 0.9, 0), ("bad", 0.8, 0), ("bad", 0.2, 1)
    ).toDF("g", "score", "y")
    val out = Classify.averagePrecisionByGroup(two, col("score"),
      col("y"), col("g")).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("good") === 1.0)
    assert(out("bad") === 0.333333) // single positive at rank 3: AP = 1/3
  }

  test("calibrationError: hand-checked ECE over the exact bins; " +
      "a perfectly calibrated bin contributes zero") {
    // bin 0: scores 0.05/0.05, 1 of 2 positive -> frac .5, mean .05,
    //        gap .45, weight 2/4
    // bin 5: score 0.5, 1 of 1 positive   -> gap .5, weight 1/4
    // bin 9: score 1.0, 1 of 1 positive   -> gap 0 (perfectly calibrated)
    val rows = Seq((0.05, 0), (0.05, 1), (0.5, 1), (1.0, 1))
      .toDF("score", "y")
    val r = Classify.calibrationError(rows, col("score"), col("y"), 10)
      .head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 0.35) // (2*.45 + 1*.5 + 1*0) / 4
  }

  test("agreementKappa: hand-checked kappa, chance-only agreement is 0") {
    // 10 rows: a=4 both-keep, b=1, c=1, d=4 → po=0.8, pe=0.5, kappa=0.6
    val rows = (Seq.fill(4)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(4)((false, false)))
      .toDF("pa", "pb")
    val r = Classify.agreementKappa(rows, col("pa"), col("pb")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 1L, 1L, 4L)))
    assert(r.getDouble(4) === 0.8)
    assert(r.getDouble(5) === 0.6)
    // independent filters at 50% each: agreement exactly at chance
    val chance = Seq((true, true), (true, false), (false, true),
      (false, false)).toDF("pa", "pb")
    assert(Classify.agreementKappa(chance, col("pa"), col("pb"))
      .head().getDouble(5) === 0.0)
    // degenerate: both always keep → pe = 1 → null kappa
    val degen = Seq((true, true), (true, true)).toDF("pa", "pb")
    assert(Classify.agreementKappa(degen, col("pa"), col("pb"))
      .head().isNullAt(5))
  }

  test("calibrationBins: assignment, edge score 1.0 stays in last bin") {
    val rows = Seq((0.05, 0), (0.05, 1), (0.55, 1), (1.0, 1))
      .toDF("score", "y")
    val out = Classify.calibrationBins(rows, col("score"), col("y"), 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet === Set(0, 5, 9))
    assert(out(0).getLong(1) === 2L)
    assert(out(0).getDouble(4) === 0.5)
    assert(out(0).getDouble(3) === 0.05)
    assert(out(9).getLong(1) === 1L, "score 1.0 clamps into bin 9")
  }

  test("deterministic under repartitioning") {
    val a = Classify.evalBinary(scored, col("score"), col("y"),
      Seq(0.3, 0.7)).collect().map(_.toSeq).toSet
    val b = Classify.evalBinary(scored.repartition(5), col("score"),
      col("y"), Seq(0.3, 0.7)).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("averagePrecision matches the threshold-step hand computation, " +
      "ties grouped at their threshold") {
    // thresholds desc: 0.9 (1 pos) -> P=1/1, term 1
    //                  0.8 (1 pos, 1 neg tied) -> P=2/3, term 2/3
    //                  0.7 (neg only) -> term 0
    //                  0.5 (1 pos) -> P=3/5, term 3/5
    // AP = (1 + 2/3 + 3/5) / 3 = 0.755556 at snap-6
    val rows = Seq((0.9, 1), (0.8, 0), (0.8, 1), (0.7, 0), (0.5, 1))
      .toDF("score", "y")
    val r = Classify.averagePrecision(rows, col("score"), col("y")).head()
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.755556)
  }

  test("averagePrecision: perfect ranking is 1.0; no positives is null; " +
      "deterministic under repartitioning") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("score", "y")
    assert(Classify.averagePrecision(perfect, col("score"), col("y"))
      .head().getDouble(2) === 1.0)
    val allNeg = Seq((0.9, 0), (0.1, 0)).toDF("score", "y")
    assert(Classify.averagePrecision(allNeg, col("score"), col("y"))
      .head().isNullAt(2))
    val a = Classify.averagePrecision(scored, col("score"), col("y"))
      .collect().map(_.toSeq).toSet
    val b = Classify.averagePrecision(scored.repartition(7), col("score"),
      col("y")).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
