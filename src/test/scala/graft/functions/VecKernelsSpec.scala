package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VecCombine kernel: bit-for-bit parity with the HOF fold it replaced,
  * mixed element types, null semantics, codegen participation. */
class VecKernelsSpec extends SparkSpec {
  import spark.implicits._

  /** The ORIGINAL higher-order formulation — the reference semantics the
    * oracles replay. */
  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def hofL2(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF fold on random float vectors") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(300)((
      Array.fill(64)(rng.nextFloat() * 2 - 1),
      Array.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
      VecKernels.dot(col("a"), col("b")).as("kd"),
      hofDot(col("a"), col("b")).as("hd"),
      VecKernels.l2sq(col("a"), col("b")).as("kl"),
      hofL2(col("a"), col("b")).as("hl"))
      .filter(col("kd") =!= col("hd") || col("kl") =!= col("hl"))
    assert(bad.count() === 0L, "kernel must match the fold bit for bit")
  }

  test("mixed float/double inputs and double literals work") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f))).toDF("v")
    val p = array(lit(0.5), lit(-1.0), lit(2.0))
    val got = df.select(VecKernels.dot(col("v"), p)).as[Double].collect().head
    assert(got === 1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0)
  }

  test("null array, length mismatch, and null element all yield null") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))),     // ok
      (None, Some(Seq(1.0, 2.0)))                      // null array
    ).toDF("a", "b")
    val r1 = df.select(VecKernels.dot(col("a"), col("b"))).collect()
    assert(r1(0).getDouble(0) === 5.0)
    assert(r1(1).isNullAt(0))
    // length mismatch → null (zip_with pads with null in the HOF form)
    val mm = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0))).toDF("a", "b")
      .select(VecKernels.dot(col("a"), col("b"))).collect()
    assert(mm(0).isNullAt(0))
    // null element → null
    val ne = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)))
      .toDF("a", "b")
      .select(VecKernels.dot(col("a"), col("b"))).collect()
    assert(ne(0).isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    // range input: a local relation would be constant-folded away
    val df = spark.range(10).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(1.0), col("id").cast("double")).as("b"))
    val plan = df.select(VecKernels.dot(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("vec_dot")), s"plan:\n$plan")
  }

  test("integral element types are widened like the old array<double> cast") {
    val df = Seq((Seq(1, 2, 3), Seq(4L, 5L, 6L))).toDF("a", "b")
    val r = df.select(
      VecKernels.dot(col("a"), col("b")).as("kd"),
      hofDot(col("a"), col("b")).as("hd"),
      VecKernels.l2sq(col("a"), col("b")).as("kl"),
      hofL2(col("a"), col("b")).as("hl")).collect()(0)
    assert(r.getDouble(0) === r.getDouble(1))   // 32.0
    assert(r.getDouble(2) === r.getDouble(3))   // 27.0
    assert(r.getDouble(0) === 32.0)
  }
}
