package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence packing: spans tile documents exactly, examples fill to
  * seqLen, and the distributed prefix sum equals the window oracle. */
class PackSpec extends SparkSpec {
  import spark.implicits._

  // 60 docs with token counts 1..40 cycling, a few zeros interleaved
  private def docs = spark.range(60).select(
    col("id"),
    when(col("id") % 7 === 0, lit(0L)).otherwise(col("id") % 40 + 1).as("w"))

  test("per-document spans are contiguous and sum to the token count") {
    val packed = Pack.packExamples(docs, "id", "w", seqLen = 16)
    val perDoc = packed.groupBy("id")
      .agg(sum("tok_len").as("t"), min("tok_start").as("s0"),
        count(lit(1)).as("spans"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("t"), r.getAs[Long]("s0"))).toMap
    val weights = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    weights.foreach { case (id, w) =>
      if (w == 0) assert(!perDoc.contains(id), s"zero-weight doc $id kept")
      else {
        assert(perDoc(id)._1 === w, s"doc $id spans must sum to $w")
        assert(perDoc(id)._2 === 0L, s"doc $id must start at token 0")
      }
    }
  }

  test("every example holds exactly seqLen tokens except the last") {
    val packed = Pack.packExamples(docs, "id", "w", seqLen = 16)
    val sums = packed.groupBy("example_id").agg(sum("tok_len").as("t"))
      .orderBy("example_id")
      .collect().map(r => (r.getAs[Long]("example_id"), r.getAs[Long]("t")))
    val total = docs.agg(sum("w")).as[Long].collect().head
    assert(sums.map(_._1).toSeq === sums.indices.map(_.toLong),
      "example ids must be dense from 0")
    sums.init.foreach { case (e, t) => assert(t === 16L, s"example $e") }
    assert(sums.map(_._2).sum === total)
  }

  test("matches the single-task window formulation bit for bit") {
    val l = 16
    val off = docs.withColumn("off",
      coalesce(sum(col("w")).over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("w") > 0)
    val oracle = off.select(col("id"), explode(sequence(
        floor(col("off") / l).cast("long"),
        floor((col("off") + col("w") - 1) / l).cast("long"))).as("example_id"),
        col("off"), col("w"))
      .select(col("id"), col("example_id"),
        greatest(lit(0L), col("example_id") * l - col("off")).as("tok_start"),
        (least(col("w"), (col("example_id") + 1) * l - col("off")) -
          greatest(lit(0L), col("example_id") * l - col("off"))).as("tok_len"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val got = Pack.packExamples(docs, "id", "w", seqLen = l)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq === oracle.toSeq)
  }

  test("deterministic under repartitioning") {
    val a = Pack.packExamples(docs, "id", "w", 16)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = Pack.packExamples(docs.repartition(11), "id", "w", 16)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a === b)
  }

  test("truncationSweep: hand counts per length, and each length's row " +
    "equals single-length truncationLoss") {
    import spark.implicits._
    val nts = Seq((1L, 3L), (2L, 5L), (3L, 10L)).toDF("id", "nt")
    val got = Pack.truncationSweep(nts, col("nt"), Seq(4, 8))
      .collect().map(_.toSeq).toSet
    // len 4: trunc {5,10}, lost (1+6)=7/18; len 8: trunc {10}, lost 2/18
    assert(got === Set(
      Seq(4L, 3L, 2L, 18L, 7L, 0.666667, 0.388889),
      Seq(8L, 3L, 1L, 18L, 2L, 0.333333, 0.111111)))
    val single = Pack.truncationLoss(nts, lit(8L), col("nt"), 8)
      .drop("grp").collect().map(_.toSeq).toSet
    val sweep8 = Pack.truncationSweep(nts, col("nt"), Seq(8))
      .drop("seq_len").collect().map(_.toSeq).toSet
    assert(sweep8 === single)
  }
}
