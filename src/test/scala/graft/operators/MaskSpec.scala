package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Span corruption: block alignment, rate, reproducibility. */
class MaskSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Long) = spark.range(n).select(
    col("id"),
    concat_ws(" ", transform(sequence(lit(0), lit(19)),
      i => concat(lit("w"), i))).as("text"))

  test("masks whole blocks: masked positions come in blockLen runs") {
    val out = Mask.spanCorrupt(corpus(200), col("id"), col("text"),
      blockLen = 4, denom = 3).collect()
    out.foreach { r =>
      val toks = r.getString(3).split(" ")
      assert(toks.length === 20)
      toks.grouped(4).foreach { block =>
        val m = block.count(_ == "<mask>")
        assert(m === 0 || m === 4, s"partial block mask: ${block.toSeq}")
      }
      assert(r.getLong(2) === toks.count(_ == "<mask>"))
    }
  }

  test("corruption rate tracks 1/denom") {
    val out = Mask.spanCorrupt(corpus(2000), col("id"), col("text"), 4, 5)
      .agg(sum("n_masked").cast("double") / sum("n_tokens")).head()
      .getDouble(0)
    assert(math.abs(out - 0.2) < 0.03, s"rate $out")
  }

  test("pure function of (id, block): stable across partitionings") {
    val a = Mask.spanCorrupt(corpus(100), col("id"), col("text"), 4, 3)
      .collect().map(_.toSeq).toSet
    val b = Mask.spanCorrupt(corpus(100).repartition(7), col("id"),
      col("text"), 4, 3).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("empty docs pass through with zero counts") {
    val out = Mask.spanCorrupt(Seq((1L, "  ")).toDF("id", "text"),
      col("id"), col("text"), 4, 3).head()
    assert((out.getLong(1), out.getLong(2), out.getString(3)) ===
      ((0L, 0L, "")))
  }
}
