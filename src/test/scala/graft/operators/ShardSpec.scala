package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token-budget sharding: the distributed two-phase prefix sum must equal
  * the single-task running-sum window for any partition count, and shard
  * boundaries must land exactly on budget multiples of the prefix. */
class ShardSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: exclusive prefix sum in order, floor-div budget. */
  private def reference(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val shard = acc / budget
      acc += w
      id -> shard
    }.toMap
  }

  test("equals the naive running-sum window") {
    val rows = (0L until 1000L).map(i => (i, (i * 37 % 90) + 10))
    val got = Shard.byBudget(rows.toDF("id", "w"), "id", "w", budget = 5000)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === reference(rows, 5000))
  }

  test("partition-count invariance (1, 3, and 32 range partitions)") {
    val rows = (0L until 500L).map(i => (i, i % 13 + 1))
    val df = rows.toDF("id", "w")
    val expected = reference(rows, 100)
    for (p <- Seq(1, 3, 32)) {
      val got = Shard.byBudget(df, "id", "w", budget = 100, partitions = p)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expected, s"mismatch at $p partitions")
    }
  }

  test("unsorted, non-contiguous input is ordered by the order column") {
    val rows = Seq((30L, 7L), (10L, 5L), (20L, 6L), (5L, 4L))
    val got = Shard.byBudget(rows.toDF("id", "w"), "id", "w", budget = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // order 5,10,20,30; exclusive prefixes 0,4,9,15 -> shards 0,0,0,1
    assert(got === Map(5L -> 0L, 10L -> 0L, 20L -> 0L, 30L -> 1L))
  }

  test("a single over-budget row still occupies exactly one shard index") {
    val rows = Seq((1L, 25L), (2L, 1L))
    val got = Shard.byBudget(rows.toDF("id", "w"), "id", "w", budget = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // prefix(2) = 25 -> shard 2: oversize rows skip shard indices, they
    // are never split (documented floor-prefix semantics)
    assert(got === Map(1L -> 0L, 2L -> 2L))
  }

  test("empty input yields an empty result, not a failure") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "w")
    assert(Shard.byBudget(empty, "id", "w", budget = 10).count() === 0L)
  }

  test("shard weights are budget-bounded apart from oversize rows") {
    val rows = (0L until 2000L).map(i => (i, i % 7 + 1))
    val budget = 61L
    val byShard = Shard.byBudget(rows.toDF("id", "w"), "id", "w", budget)
      .groupBy("shard").agg(sum("w").as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every weight < budget here, so each shard holds < budget + max(w)
    assert(byShard.values.forall(_ < budget + 7),
      s"over-packed shard in $byShard")
  }
}
