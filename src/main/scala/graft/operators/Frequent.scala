package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters at sketch cost (§2.10 extension surface — the
  * "find the boilerplate / hot n-grams" primitive of a training-data
  * pipeline).
  *
  * Two passes:
  *   1. per-partition Misra–Gries with `counters` counters emits a small
  *      candidate superset — O(counters) memory per task, and only
  *      partitions × counters candidate strings ever leave the executors.
  *      MG's guarantee: any item whose partition-local count exceeds
  *      n_p/(counters+1) survives that partition's sketch; summing over
  *      partitions, any item with global count > n/(counters+1) must
  *      exceed the local bound somewhere (pigeonhole), so with
  *      minShare > 1/(counters+1) the union has NO false negatives.
  *   2. an exact recount restricted to the candidate set — the groupBy
  *      shuffles at most `counters` distinct keys per partition after
  *      map-side combine, instead of the full vocabulary. At web scale
  *      (billions of distinct tokens) that is the difference between a
  *      metadata-sized shuffle and a full-vocabulary one.
  *
  * False positives from pass 1 are eliminated by the exact threshold in
  * pass 2, so the output is EXACTLY {item : count(item) >= ceil(minShare
  * * n)} with exact counts — a plain GROUP BY/HAVING to any SQL oracle,
  * despite the sketch in the middle. Deterministic regardless of
  * partitioning: the candidate set varies, the thresholded output never
  * does.
  *
  * The pass-1 summary (candidates + per-partition totals, ≤ partitions ×
  * (counters+1) tuples) is collected to the driver: sketch metadata, not
  * data — same class as the 1-row convergence probe and the seed
  * codebook, and it is what lets both passes share one scan each with no
  * persist of the input.
  */
object Frequent {

  /** Items of `key` with frequency >= ceil(minShare * n), exact counts.
    * Output: (item, cnt, n_total). Requires minShare > 1/(counters+1)
    * so the Misra–Gries union provably contains every heavy hitter. */
  def heavyHitters(df: DataFrame, key: Column, minShare: Double,
      counters: Int = 256): DataFrame = {
    require(minShare > 0.0 && minShare < 1.0,
      s"minShare must be in (0,1), got $minShare")
    require(minShare > 1.0 / (counters + 1),
      s"minShare=$minShare below the Misra-Gries guarantee 1/(counters+1)=" +
        s"${1.0 / (counters + 1)} — raise counters or minShare")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(key.cast("string").as("item"))
      .filter(col("item").isNotNull)

    // Pass 1: per-partition Misra-Gries; each partition emits its
    // candidates as (item, 0) plus one (null, n_p) total row, so the
    // threshold needs no separate counting scan.
    val summary: Array[(String, Long)] = keys.as[String].mapPartitions { it =>
      val counts = new java.util.HashMap[String, java.lang.Long](counters * 2)
      var np = 0L
      it.foreach { k =>
        np += 1
        val cur = counts.get(k)
        if (cur != null) counts.put(k, cur + 1L)
        else if (counts.size < counters) counts.put(k, 1L)
        else {
          // decrement-all step: drop every counter by one, evict zeros
          val e = counts.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue == 1L) e.remove()
            else en.setValue(en.getValue - 1L)
          }
        }
      }
      counts.keySet().iterator().asScala.map(k => (k, 0L)) ++
        Iterator.single((null: String, np))
    }.collect()

    val nTotal = summary.collect { case (null, np) => np }.sum
    val threshold = math.ceil(minShare * nTotal).toLong
    val candidates = summary.collect { case (k, _) if k != null => k }
      .distinct.toSeq.toDF("item")

    // Pass 2: exact recount over candidate rows only; broadcast semi-join
    // keeps the scan map-side, partial agg bounds the shuffle by the
    // candidate count.
    keys
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("item"), col("cnt"), lit(nTotal).as("n_total"))
  }
}
