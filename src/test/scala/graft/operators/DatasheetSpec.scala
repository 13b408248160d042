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

  test("mixDrift: identical snapshots drift zero; a vanished source " +
      "contributes its one-sided JS term; shares track tokens") {
    val docs = Seq(
      ("a", "one two three four"), // 4 tokens
      ("b", "five six"),           // 2
      ("b", "seven eight")         // 2
    ).toDF("src", "text")
    val same = Datasheet.mixDrift(docs, docs, col("text"), col("src"))
      .collect()
    assert(same.forall(r => r.getDouble(7) === 0.0 && r.getLong(8) === 0L),
      "no drift between identical snapshots")
    // new snapshot loses source a entirely: old shares a=0.5 b=0.5,
    // new shares a=0 b=1
    val newer = docs.filter(col("src") =!= "a")
    val out = Datasheet.mixDrift(docs, newer, col("text"), col("src"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(4) === 0L) // new_tokens
    assert(out("a").getDouble(5) === 0.5)
    assert(out("a").getDouble(6) === 0.0)
    assert(out("a").getDouble(7) === -0.5)
    // one-sided term: 0.5 * p * ln(p / (p/2)) = 0.5 * 0.5 * ln 2
    assert(out("a").getLong(8) ===
      math.rint(0.5 * 0.5 * math.log(2.0) * 1e9).toLong)
    // b: p=0.5, q=1 -> 0.5*0.5*ln(0.5/0.75) + 0.5*1*ln(1/0.75)
    val bExp = 0.5 * 0.5 * math.log(0.5 / 0.75) +
      0.5 * 1.0 * math.log(1.0 / 0.75)
    assert(out("b").getLong(8) === math.rint(bExp * 1e9).toLong)
    // total JS of disjoint-support would be ln 2; this partial shift
    // stays strictly inside (0, ln 2)
    val totalJs = out.values.map(_.getLong(8)).sum
    assert(totalJs > 0L && totalJs < math.rint(math.log(2.0) * 1e9).toLong)
  }

  test("embeddingHealth: ragged dims, zero-norm rows, and exact norm " +
    "stats per group") {
    val embs = Seq(
      ("A", Array(3.0f, 4.0f)),  // ‖v‖² = 25
      ("A", Array(0.0f, 0.0f)),  // zero-norm
      ("B", Array(1.0f)),        // ragged: 1 dim
      ("B", Array(1.0f, 1.0f, 1.0f))) // 3 dims, ‖v‖² = 3
      .toDF("grp", "embedding")
    val got = Datasheet.embeddingHealth(embs, col("embedding"), col("grp"))
      .as[(String, Long, Int, Int, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("A") === ("A", 2L, 2, 2, 1L, 12.5, 0.0, 25.0))
    assert(got("B") === ("B", 2L, 1, 3, 0L, 2.0, 1.0, 3.0))
  }
}
