package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for each left row, the most recent right row of the same
  * key with `rightTs` ≤ `leftTs` (the operator time-series engines ship
  * natively and Spark lacks; SURVEY.md §2.10 extension surface).
  *
  * Spark-first scale shape: NOT the naive equi-join + inequality filter —
  * that materializes |left_key| × |right_key| rows per key before the
  * top-1 window prunes them, a quadratic blowup on hot keys. Instead the
  * classic single-shuffle merge:
  *
  *   1. union both sides, tagged, with right-before-left ordering at
  *      equal timestamps (right rows at ts are eligible for left rows
  *      at the same ts);
  *   2. ONE hash repartition by key + per-partition sort on
  *      (key, ts, side) — Spark's Exchange + local sort, no join node;
  *   3. a linear `mapPartitions` merge that carries the latest right row
  *      per key group and emits one output row per left row.
  *
  * Cost is one shuffle of |left|+|right| rows and a linear scan —
  * independent of per-key density. The imperative step is a genuine
  * per-partition merge (the documented mapPartitions exception): it
  * relies on the sort order Catalyst cannot express relationally without
  * the quadratic join. Left rows with no match keep null right columns
  * (left-outer semantics, like DuckDB's ASOF LEFT JOIN which the oracle
  * uses).
  *
  * Ties: when several right rows share (key, rightTs), the winner is the
  * GREATEST row by lexicographic struct comparison over the right columns
  * — an explicit total order, deterministic across runs and partitionings
  * (the right struct is the final sort key, and the merge keeps the last
  * eligible right row). If the right schema contains an unorderable type
  * (e.g. a map column), the tie-break cannot be expressed and ties fall
  * back to sort-incidental order — deduplicate such inputs on
  * (key, rightTs) first.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPrefix: String = "asof_"): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).cast("timestamp").as("__ts"), lit(1).as("__side"),
        lStruct.as("__left"), lit(null).cast(rType).as("__right")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast("timestamp").as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__left"), rStruct.as("__right")): _*)

    // final sort key = the right struct itself: deterministic tie-break
    // among right rows equal on (key, ts) — last (= greatest) one wins
    val tieBreak =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(rType))
        Seq(col("__right")) else Seq.empty
    val sorted = l.unionByName(r)
      .repartition(keys.map(col): _*)
      .sortWithinPartitions(
        (keys.map(col) ++ Seq(col("__ts"), col("__side")) ++ tieBreak)
          .map(_.asc): _*)

    val nKeys = keys.length
    val outSchema = StructType(lType.fields ++
      rType.fields.map(f => f.copy(name = rightPrefix + f.name, nullable = true)))
    val nR = rType.length

    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var lastRight: Row = null
      it.flatMap { row =>
        val key = (0 until nKeys).map(row.get)
        if (key != curKey) { curKey = key; lastRight = null }
        // SQL join semantics: a NULL key never matches anything — rows in
        // a null-key group neither provide nor receive matches
        val nullKey = key.exists(_ == null)
        if (row.getInt(nKeys + 1) == 0) { // right side: remember, emit nothing
          if (!nullKey) lastRight = row.getStruct(nKeys + 3)
          Iterator.empty
        } else {
          val lRow = row.getStruct(nKeys + 2)
          val rVals =
            if (nullKey || lastRight == null) Seq.fill[Any](nR)(null)
            else lastRight.toSeq
          Iterator.single(Row.fromSeq(lRow.toSeq ++ rVals))
        }
      }
    }(Encoders.row(outSchema))
  }
}
