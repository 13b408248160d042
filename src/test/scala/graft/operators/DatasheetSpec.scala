package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dataset card: per-source panel values on a controlled corpus. */
class DatasheetSpec extends SparkSpec {
  import spark.implicits._

  test("volume, dup load, and distinct estimates are per-source") {
    // srcA: 3 docs, one exact-dup pair; srcB: 2 distinct docs; srcC: empty doc
    val docs = Seq(
      (1L, "a", "the cat sat"), (2L, "a", "the cat sat"),
      (3L, "a", "dogs run fast"),
      (4L, "b", "hello world"), (5L, "b", "more words here now"),
      (6L, "c", "   ")
    ).toDF("doc_id", "src", "text")
    val out = Datasheet.perSourceCard(docs, col("doc_id"), col("text"),
      col("src")).collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) === 3L)
    assert(out("a").getLong(2) === 9L)
    assert(out("a").getLong(3) === 2L, "both copies count as dup load")
    assert(out("b").getLong(3) === 0L)
    // 6 distinct tokens in srcA at p=8: linear counting is near-exact
    assert(math.abs(out("a").getDouble(5) - 6.0) < 1.0)
    assert(out("c").getLong(2) === 0L)
    assert(out("c").isNullAt(4), "no non-empty docs -> no quality")
  }

  test("deterministic under repartitioning") {
    val docs = (1L to 60L).map(i => (i, s"s${i % 3}", s"tok$i the end"))
      .toDF("doc_id", "src", "text")
    val a = Datasheet.perSourceCard(docs, col("doc_id"), col("text"),
      col("src")).collect().map(_.toSeq).toSet
    val b = Datasheet.perSourceCard(docs.repartition(7), col("doc_id"),
      col("text"), col("src")).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
