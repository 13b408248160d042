package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §2.10 scale notes): salting for hot keys.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting remains the tool for (a) skewed AGGREGATIONS, where one hot group
  * otherwise lands on one task, and (b) joins where the physical plan AQE
  * picks can't be split. Both transforms are pure plan rewrites — results
  * are identical to the unsalted equivalents (asserted in tests).
  */
object Skew {

  /** Salt that varies WITHIN a key group: derived from the row's physical
    * position (partition id + per-partition row index), not from the row's
    * content — a content hash is a pure function of the key when the input
    * is projected to the key columns, so every row of a hot group would get
    * the same salt and no spreading would occur. Position-based salt is
    * deterministic for a given run's partitioning, which is all a spreading
    * device needs (the final re-aggregation erases it from the result). */
  private def positionSalt(saltFactor: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltFactor.toLong))

  /** Two-phase salted count: partial count on (keys, salt) spreads a hot
    * key over `saltFactor` reducers, final phase re-aggregates per key. */
  def saltedCount(df: DataFrame, keys: Seq[String],
                  saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt", positionSalt(saltFactor))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }

  /** Salted equi-join of a skewed big side against a small side: the big
    * side gets a row-hash salt in [0, saltFactor), the small side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows now spread across saltFactor tasks.
    * Inner join only (replication breaks outer-join null semantics). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", positionSalt(saltFactor))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
