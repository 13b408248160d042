package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Portable-MinHash LSH + candidate-recall invariants (q155's operator).
  * The permutation family is plain modular arithmetic, so the spec can
  * recompute a signature by hand and pin the band construction exactly. */
class PortableLshSpec extends SparkSpec {
  import spark.implicits._

  private def poly(s: String): Long =
    graft.functions.HashKernels.polyHash(UTF8String.fromString(s), 31L,
      NearDup.PortablePrime)

  test("portableMinhashBands matches a hand-computed signature") {
    val text = "a b c d"
    val docs = Seq((1L, text)).toDF("id", "text")
    // word 3-shingles of "a b c d": "a b c", "b c d"
    val phs = Seq("a b c", "b c d").map(poly)
    val mins = (0 until 4).map { i =>
      phs.map(p => ((2L * i + 3) * p + (101L * i + 7)) %
        NearDup.PortablePrime).min
    }
    val got = NearDup.portableMinhashBands(docs, col("id"), col("text"),
        n = 3, bands = 2, rowsPerBand = 2)
      .orderBy("band")
      .as[(Long, Int, String)].collect()
    assert(got === Seq(
      (1L, 0, s"${mins(0)},${mins(1)}"),
      (1L, 1, s"${mins(2)},${mins(3)}")))
  }

  test("identical docs collide on every band; empty docs produce none") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, ""),
      (4L, "completely different text with nothing shared here at all"))
      .toDF("id", "text")
    val bands = NearDup.portableMinhashBands(docs, col("id"), col("text"),
      n = 3, bands = 4, rowsPerBand = 4)
    assert(bands.filter(col("id") === 3L).count() === 0L)
    val cand = NearDup.portableLshCandidates(docs, col("id"), col("text"),
      n = 3, bands = 4, rowsPerBand = 4)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)))
    assert(!cand.contains((1L, 4L)) && !cand.contains((2L, 4L)))
  }

  test("lshRecallByBucket: exact bucket arithmetic on a hand-built set") {
    val exact = Seq(
      (1L, 2L, 1.0), (3L, 4L, 0.95), (5L, 6L, 0.92), // bucket 0.9 ×2, 1.0 ×1
      (7L, 8L, 0.85), (9L, 10L, 0.81)) // bucket 0.8 ×2
      .toDF("id_a", "id_b", "jaccard")
    val cand = Seq((1L, 2L), (3L, 4L), (7L, 8L), (11L, 12L)) // one spurious
      .toDF("id_a", "id_b")
    val got = NearDup.lshRecallByBucket(exact, cand)
      .orderBy("j_bucket")
      .as[(Double, Long, Long, Double)].collect()
    assert(got === Seq(
      (0.8, 2L, 1L, 0.5),
      (0.9, 2L, 1L, 0.5),
      (1.0, 1L, 1L, 1.0)))
  }

  test("lossy banding degrades recall on mid-similarity pairs but keeps " +
    "exact dups — the S-curve the monitor exists to watch") {
    // 60 base docs of 30 distinct tokens each; for each base, a variant
    // sharing the first half of the token stream (3-shingle Jaccard
    // 13/43 ≈ 0.30) → mid-similarity pairs whose candidate probability
    // under 2 bands × 8 rows is tiny (1-(1-0.3^8)^2 ≈ 1.3e-4), while
    // exact duplicates (j = 1) always collide on every band.
    val base = (0 until 60).map { d =>
      val toks = (0 until 30).map(t => s"w${d}_$t").mkString(" ")
      (d.toLong, toks)
    }
    val halves = (0 until 60).map { d =>
      val toks = (0 until 30)
        .map(t => if (t < 15) s"w${d}_$t" else s"v${d}_$t")
        .mkString(" ")
      (1000L + d, toks)
    }
    val dups = (0 until 60).map(d => (2000L + d, base(d)._2))
    val docs = (base ++ halves ++ dups).toDF("id", "text")
    val exact = NearDup.shingleJaccardPairs(docs, col("id"), col("text"),
      n = 3, threshold = 0.05, maxPostings = 1000)
    val cand = NearDup.portableLshCandidates(docs, col("id"), col("text"),
      n = 3, bands = 2, rowsPerBand = 8)
    val rec = NearDup.lshRecallByBucket(exact, cand)
      .as[(Double, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rec(1.0)._4 === 1.0) // exact dups: every band collides
    // the half-overlap pairs live in low buckets; 2×8 banding must lose
    // most of them (P(cand | j=0.2) = 1-(1-0.2^8)^2 ~ 5e-6)
    val low = rec.filterNot(_._1 == 1.0).values
    assert(low.nonEmpty && low.forall(_._4 < 0.5))
  }

  test("blockerQa: a q-gram-invisible true pair shows up as lost " +
    "completeness, and the ratios are exact") {
    // pair (1,2): distance 1, shares plenty of 8-grams — blocker catches.
    // pair (3,4): distance 4, but a substitution every 7th char caps
    // common runs at 6 chars — NO shared 8-gram, the blocker's pigeonhole
    // precondition (len > q·(maxDist+1)) deliberately violated.
    val docs = Seq(
      (1L, "prefix shared abcdefgh tail one x"),
      (2L, "prefix shared abcdefgh tail one y"),
      (3L, "qqqqqqAwwwwwwBeeeeeeCrrrrrrD"),
      (4L, "qqqqqq1wwwwww2eeeeee3rrrrrr4"))
      .toDF("id", "text")
    val got = NearDup.blockerQa(docs, col("id"), col("text"),
        prefixLen = 40, q = 8, maxDist = 12, maxPostings = 200,
        sampleMod = 1L)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    // n_sample=4, truth={(1,2),(3,4)}, cand={(1,2)} → completeness 1/2,
    // reduction 1 - 1/6
    assert(got === Seq((4L, 2L, 1L, 1L, 0.5, 0.833333)))
  }
}
