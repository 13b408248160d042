package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style invariants for the round-6 corpus-assembly operators,
  * over seeded random inputs:
  *  - Pack: spans tile every doc exactly, examples fill to seqLen with
  *    one partial tail, example ids are dense from 0
  *  - Mix: kept set ⊆ input, rates honor the integer formula, groups
  *    under budget survive intact
  *  - count-min: est >= exact for every probe, under any (depth, width)
  */
class PackMixPropertySpec extends SparkSpec {
  import spark.implicits._

  test("packExamples tiling invariants hold on 15 random corpora") {
    val rng = new scala.util.Random(19)
    for (trial <- 1 to 15) {
      val n = rng.nextInt(200) + 20
      val seqLen = rng.nextInt(60) + 5
      val weights = (0L until n).map(i =>
        i -> (if (rng.nextInt(6) == 0) 0L else rng.nextInt(3 * seqLen) + 1L))
      val df = weights.toDF("id", "w")
      val packed = Pack.packExamples(df, "id", "w", seqLen).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val total = weights.map(_._2).sum
      val label = s"trial $trial (n=$n seqLen=$seqLen total=$total)"
      // per-doc: spans sum to w, start at 0, contiguous
      packed.groupBy(_._1).foreach { case (id, spans) =>
        val w = weights.toMap.apply(id)
        assert(spans.map(_._4).sum === w, s"$label doc $id")
        val sorted = spans.sortBy(_._3)
        assert(sorted.head._3 === 0L, s"$label doc $id start")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._3 + a._4 === b._3, s"$label doc $id contiguity")
          case _ =>
        }
      }
      // zero-weight docs absent
      assert(!packed.exists(p => weights.toMap.apply(p._1) == 0L), label)
      // per-example: dense ids, full except the tail
      val byEx = packed.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
      if (total > 0) {
        val maxEx = byEx.keys.max
        assert(byEx.keySet === (0L to maxEx).toSet, s"$label dense ids")
        (0L until maxEx).foreach(e =>
          assert(byEx(e) === seqLen.toLong, s"$label example $e"))
        assert(byEx(maxEx) === total - maxEx * seqLen, s"$label tail")
      }
    }
  }

  test("sampleToBudget invariants hold on 15 random corpora") {
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 15) {
      val n = rng.nextInt(300) + 50
      val budget = rng.nextInt(2000) + 100L
      val rows = (0L until n).map(i =>
        (i, s"g${rng.nextInt(5)}", rng.nextInt(50) + 1L))
      val df = rows.toDF("id", "src", "w")
      val kept = Mix.sampleToBudget(df, col("id"), col("src"), col("w"),
        budget).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val label = s"trial $trial (n=$n budget=$budget)"
      val inputIds = rows.map(_._1).toSet
      assert(kept.forall(k => inputIds.contains(k._1)), label)
      val totals = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      kept.groupBy(_._2).foreach { case (g, ks) =>
        val expRate = math.min(10000L, budget * 10000L / totals(g))
        assert(ks.forall(_._4 === expRate), s"$label group $g rate")
      }
      // groups under budget keep every row
      totals.filter(_._2 <= budget).keys.foreach { g =>
        val inG = rows.count(_._2 == g)
        assert(kept.count(_._2 == g) === inG, s"$label full group $g")
      }
    }
  }

  test("count-min overestimate property holds for random shapes") {
    val rng = new scala.util.Random(29)
    for (trial <- 1 to 8) {
      val depth = rng.nextInt(3) + 1
      val width = Seq(4, 16, 64)(rng.nextInt(3))
      val stream = Seq.fill(rng.nextInt(4000) + 500)(s"k${rng.nextInt(60)}")
      val probes = (0 until 10).map(i => s"k${rng.nextInt(80)}").distinct
      val rowsOut = Sketch.countMinEstimates(stream.toDF("key"), col("key"),
        depth, width, probes).collect()
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val label = s"trial $trial (d=$depth w=$width)"
      assert(rowsOut.length === probes.length, label)
      rowsOut.foreach { r =>
        val (tok, est, ex) = (r.getString(0), r.getLong(1), r.getLong(2))
        assert(ex === exact.getOrElse(tok, 0L), s"$label exact $tok")
        assert(est >= ex, s"$label overestimate $tok")
      }
    }
  }
}
