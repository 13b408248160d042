package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TextRank (TextRank): co-occurrence edge law, fixed-point iteration
  * replay, centrality-over-frequency behavior, mass conservation. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrenceEdges: adjacency counts, self-loops dropped, " +
    "minCount cut, canonical a<b") {
    val docs = Seq((1L, "a b a b b"), (2L, "b a z z")).toDF("id", "text")
    val got = TextRank.cooccurrenceEdges(docs, col("text"), 1L)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    // adjacencies: (a,b) (b,a) (a,b) (b,b self-drop) | (b,a) (a,z) (z,z self-drop)
    assert(got.toSeq === Seq(("a", "b", 4L), ("a", "z", 1L)))
    val cut = TextRank.cooccurrenceEdges(docs, col("text"), 2L)
      .as[(String, String, Long)].collect()
    assert(cut.toSeq === Seq(("a", "b", 4L)))
  }

  test("one-iteration replay on a path graph matches the definition") {
    // a—b—c (w=1): N=3, wdeg a=1 b=2 c=1; r0 = round(1e12/3)
    val und = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("a", "b", "w")
    val r0 = math.round(1e12 / 3.0)
    val base = math.round(((1.0 - 0.85) * 1e12) / 3.0)
    val cAB = math.round(r0.toDouble * 0.85 * 1.0 / 1.0) // a→b (wdeg 1)
    val cBA = math.round(r0.toDouble * 0.85 * 1.0 / 2.0) // b→a (wdeg 2)
    val expA = (base + cBA) / 1e12
    val expB = (base + 2 * cAB) / 1e12
    val got = TextRank.textRankFromEdges(und, 0.85, 1, 3)
      .as[(Int, String, Double)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq === Seq("a", "b", "c"))
    assert(got.find(_._2 == "a").get._3 ===
      math.rint(expA * 1e6) / 1e6)
    assert(got.find(_._2 == "b").get._3 ===
      math.rint(expB * 1e6) / 1e6)
    assert(got.find(_._2 == "a").get._3 ===
      got.find(_._2 == "c").get._3) // symmetry
  }

  test("star center outranks leaves; scores conserve mass") {
    val und = Seq(("hub", "l1", 1L), ("hub", "l2", 1L),
      ("hub", "l3", 1L), ("hub", "l4", 1L)).toDF("a", "b", "w")
    val got = TextRank.textRankFromEdges(und, 0.85, 3, 5)
      .as[(Int, String, Double)].collect()
    assert(got.head._2 === "hub" && got.head._1 === 1)
    val leaves = got.filter(_._2 != "hub").map(_._3).toSet
    assert(leaves.size === 1) // all leaves tie by symmetry
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-5)
  }

  test("centrality beats frequency: the connective token wins even when " +
    "a clique token matches its raw count") {
    // 'k' bridges four otherwise-disjoint tokens; 'q'/'r' repeat in a
    // two-token loop with the same total edge weight as k's star
    val und = Seq(("k", "w1", 2L), ("k", "w2", 2L), ("k", "w3", 2L),
      ("k", "w4", 2L), ("q", "r", 8L)).toDF("a", "b", "w")
    val got = TextRank.textRankFromEdges(und, 0.85, 3, 7)
      .as[(Int, String, Double)].collect()
    assert(got.head._2 === "k")
    intercept[IllegalArgumentException](
      TextRank.textRankFromEdges(und, 1.0, 3, 5))
    intercept[IllegalArgumentException](
      TextRank.textRankFromEdges(und, 0.85, 0, 5))
  }
}
