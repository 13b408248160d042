package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Logistic-regression training: the model separates a separable corpus,
  * is a pure function of the data (partitioning-invariant), and moves
  * loss in the right direction. */
class LogRegTrainSpec extends SparkSpec {
  import spark.implicits._

  // 20 positive docs of "pos" tokens, 20 negative of "neg" tokens
  private def corpus = spark.range(40).select(
    col("id"),
    when(col("id") < 20, lit("pos pos pos")).otherwise(lit("neg neg neg"))
      .as("text"),
    (col("id") < 20).cast("int").as("y"))

  test("trained model separates a linearly separable corpus") {
    val (w, b) = Classify.trainLogRegModel(corpus, col("id"), col("text"),
      col("y"), dim = 16, lr = 1.0, iters = 25)
    val scores = Classify.hashedLinearScore(corpus, col("id"), col("text"),
      w.map(x => math.rint(x * 1e12) / 1e12), b)
      .join(corpus.select(col("id"), col("y")), "id")
      .groupBy("y").agg(avg("score").as("s")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(scores(1) > 0.9, s"positive class mean score ${scores(1)}")
    assert(scores(0) < 0.1, s"negative class mean score ${scores(0)}")
  }

  test("deterministic under repartitioning") {
    val a = Classify.trainLogRegModel(corpus, col("id"), col("text"),
      col("y"), dim = 16, lr = 0.5, iters = 3)
    val c = Classify.trainLogRegModel(corpus.repartition(7), col("id"),
      col("text"), col("y"), dim = 16, lr = 0.5, iters = 3)
    assert(a === c)
  }

  test("docs with no tokens are excluded, empty corpus fails loudly") {
    val withBlank = corpus.unionAll(
      Seq((99L, "   ", 1)).toDF("id", "text", "y"))
    val a = Classify.trainLogRegModel(withBlank, col("id"), col("text"),
      col("y"), dim = 16, lr = 0.5, iters = 2)
    val b = Classify.trainLogRegModel(corpus, col("id"), col("text"),
      col("y"), dim = 16, lr = 0.5, iters = 2)
    assert(a === b, "blank doc must not change the model")
    val err = intercept[IllegalArgumentException] {
      Classify.trainLogRegModel(corpus.filter(col("id") < 0), col("id"),
        col("text"), col("y"), dim = 16, lr = 0.5, iters = 1)
    }
    assert(err.getMessage.contains("no docs"))
  }
}
