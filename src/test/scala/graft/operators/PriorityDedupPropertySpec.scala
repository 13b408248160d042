package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style invariants for A1 priority dedup (SURVEY.md §5-2), over
  * seeded random batches:
  *  - exactly 1 output row per distinct input key
  *  - CANCELED present in a group ⇒ CANCELED survives
  *  - output ⊆ input
  */
class PriorityDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  test("priorityDedup invariants hold on 20 random batches") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val rows = List.fill(30)((
        s"trip${rng.nextInt(5) + 1}",
        (rng.nextInt(3) + 1).toLong,
        if (rng.nextBoolean()) "CANCELED" else "RUNNING",
        rng.nextInt(100).toLong))
      val df = rows.toDF("trip_id", "deviation_case_id", "status", "ts")
      val out = Dedup.priorityDedup(df,
        keys = Seq("trip_id", "deviation_case_id"),
        priority = when(col("status") === "CANCELED", 0).otherwise(1),
        ts = col("ts"), tieBreak = col("status")).collect()

      val byKey = out.groupBy(r => (r.getString(0), r.getLong(1)))
      // exactly one row per distinct input key
      assert(byKey.values.forall(_.length == 1))
      assert(byKey.keySet == rows.map(r => (r._1, r._2)).toSet)
      // CANCELED wins its group
      val canceledKeys = rows.filter(_._3 == "CANCELED")
        .map(r => (r._1, r._2)).toSet
      byKey.foreach { case (key, grp) =>
        if (canceledKeys.contains(key))
          assert(grp.head.getString(2) == "CANCELED")
      }
      // output ⊆ input
      val inputSet = rows.toSet
      assert(out.forall(r => inputSet.contains(
        (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))))
    }
  }
}
