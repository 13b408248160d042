package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property check for the imperative merge: on randomized data, the
  * single-shuffle merge must equal the NAIVE relational as-of formulation
  * (equi-join on key + rightTs ≤ leftTs + latest-right top-1 window) —
  * the formulation we rejected for scale but whose semantics are
  * trivially auditable. Random timestamps are drawn from a small grid so
  * equal-timestamp edge cases occur constantly. */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def naiveAsof(left: org.apache.spark.sql.DataFrame,
                        right: org.apache.spark.sql.DataFrame) = {
    val j = left.join(right.withColumnRenamed("k", "rk"),
      $"k" === $"rk" && $"rt" <= $"t", "left")
    val w = Window.partitionBy($"lid")
      .orderBy($"rt".desc_nulls_last, $"rid".desc_nulls_last)
    j.withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1)
      .select($"lid", $"rid")
      .as[(Long, Option[Long])].collect().toMap
  }

  test("merge equals the naive relational as-of on randomized inputs") {
    val rng = new scala.util.Random(7)
    for (round <- 1 to 5) {
      val nKeys = 1 + rng.nextInt(5)
      val grid = 10 // coarse grid → frequent ts collisions
      def randTs() = new Timestamp(1700000000000L + rng.nextInt(grid) * 60000L)
      val left = Seq.tabulate(40) { i =>
        (i.toLong, s"k${rng.nextInt(nKeys)}", randTs())
      }.toDF("lid", "k", "t")
      // unique (k, rt) on the right — the operator's documented tie contract
      val right = Seq.tabulate(30) { i =>
        (i.toLong + 1000L, s"k${rng.nextInt(nKeys)}", randTs())
      }.toDF("rid", "k", "rt")
        .groupBy($"k", $"rt").agg(max($"rid").as("rid"))
        .select($"rid", $"k", $"rt")

      val merged = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "rt")
        .select($"lid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
      val naive = naiveAsof(left, right)
      assert(merged === naive, s"round $round diverged")
    }
  }

  test("range join equals the naive inequality join on randomized inputs") {
    val rng = new scala.util.Random(11)
    for (round <- 1 to 5) {
      val points = Seq.tabulate(40) { i =>
        (i.toLong, s"k${rng.nextInt(4)}",
          new Timestamp(1700000000000L + rng.nextInt(500) * 60000L))
      }.toDF("pid", "k", "t")
      val intervals = Seq.tabulate(15) { i =>
        val s = 1700000000000L + rng.nextInt(500) * 60000L
        (i.toLong + 100L, s"k${rng.nextInt(4)}", new Timestamp(s),
          new Timestamp(s + rng.nextInt(200) * 60000L))
      }.toDF("iid", "k", "s", "e")

      val bucketed = RangeJoin.pointInIntervalJoin(points, intervals,
          Seq("k"), "t", "s", "e", bucketSeconds = rng.nextInt(7200) + 60L)
        .select($"pid", $"iv_iid").as[(Long, Long)].collect().toSet
      val naive = points.join(intervals.withColumnRenamed("k", "ik"),
          $"k" === $"ik" && $"s" <= $"t" && $"t" <= $"e")
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(bucketed === naive, s"round $round diverged")
    }
  }
}
