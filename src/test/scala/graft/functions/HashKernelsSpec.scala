package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PolyHash kernel: bit-for-bit parity with the relational HOF fold it
  * replaced, codegen participation, and null/empty behavior. */
class HashKernelsSpec extends SparkSpec {
  import spark.implicits._

  /** The ORIGINAL higher-order formulation, kept here as the reference
    * semantics (it is also what every oracle's list_reduce replays). */
  private def hofPoly(text: org.apache.spark.sql.Column, mult: Long,
      mod: Long): org.apache.spark.sql.Column = {
    val codes = transform(split(text, ""), c => ascii(c).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => (acc * mult + c) % mod)
  }

  test("kernel equals the HOF fold on random ASCII and multibyte strings") {
    val rng = new scala.util.Random(42)
    val pool = "abcXYZ 019_.,!é中文" // latin-1 + CJK (BMP)
    val strs = (1 to 500).map { _ =>
      (1 to rng.nextInt(40)).map(_ => pool(rng.nextInt(pool.length))).mkString
    } :+ "" :+ "a" :+ "   " :+ "中文 text"
    val df = strs.toDF("s")
    val out = df.select(
      HashKernels.polyHash(col("s"), 31L, 1000000007L).as("k"),
      hofPoly(col("s"), 31L, 1000000007L).as("h"),
      HashKernels.polyHash(col("s"), 131L, 2147483629L).as("k2"),
      hofPoly(col("s"), 131L, 2147483629L).as("h2"))
    assert(out.filter(col("k") =!= col("h") || col("k2") =!= col("h2"))
      .count() === 0L)
  }

  test("empty string hashes to 0, null stays null") {
    val df = Seq(Some(""), None, Some("x")).toDF("s")
    val rows = df.select(HashKernels.polyHash(col("s"), 31L, 1000000007L))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(rows(0) === 0L)
    assert(rows(1) === null)
    assert(rows(2) === 120L) // 'x'
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    val plan = spark.range(10).select(
      HashKernels.polyHash(col("id").cast("string"), 31L, 1000000007L))
      .queryExecution.executedPlan.toString
    // "*(n)" is the compact WholeStageCodegen marker; the projection
    // carrying poly_hash must sit inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("poly_hash")), s"plan:\n$plan")
  }
}
