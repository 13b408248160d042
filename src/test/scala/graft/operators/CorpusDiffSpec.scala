package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus snapshot diff: all four statuses, content-not-identity change
  * detection, determinism. */
class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*) = rows.toSeq.toDF("id", "text")

  test("added / removed / changed / unchanged classified per id") {
    val prev = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val cur = snap(2L -> "b", 3L -> "c2", 4L -> "d")
    val out = Dedup.corpusDiff(cur, prev, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("identical snapshots are all unchanged, regardless of partitioning") {
    val a = snap((1L to 100L).map(i => i -> s"t$i"): _*)
    val out = Dedup.corpusDiff(a.repartition(7), a.repartition(3),
      col("id"), col("text"))
    assert(out.filter(col("status") =!= "unchanged").count() === 0)
    assert(out.count() === 100)
  }
}
