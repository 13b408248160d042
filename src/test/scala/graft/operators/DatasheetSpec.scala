package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dataset card: per-source panel values on a controlled corpus. */
class DatasheetSpec extends SparkSpec {
  import spark.implicits._

  test("volume, dup load, and distinct estimates are per-source") {
    // srcA: 3 docs, one exact-dup pair; srcB: 2 distinct docs; srcC: empty doc
    val docs = Seq(
      (1L, "a", "the cat sat"), (2L, "a", "the cat sat"),
      (3L, "a", "dogs run fast"),
      (4L, "b", "hello world"), (5L, "b", "more words here now"),
      (6L, "c", "   ")
    ).toDF("doc_id", "src", "text")
    val out = Datasheet.perSourceCard(docs, col("doc_id"), col("text"),
      col("src")).collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) === 3L)
    assert(out("a").getLong(2) === 9L)
    assert(out("a").getLong(3) === 2L, "both copies count as dup load")
    assert(out("b").getLong(3) === 0L)
    // 6 distinct tokens in srcA at p=8: linear counting is near-exact
    assert(math.abs(out("a").getDouble(5) - 6.0) < 1.0)
    assert(out("c").getLong(2) === 0L)
    assert(out("c").isNullAt(4), "no non-empty docs -> no quality")
  }

  test("deterministic under repartitioning") {
    val docs = (1L to 60L).map(i => (i, s"s${i % 3}", s"tok$i the end"))
      .toDF("doc_id", "src", "text")
    val a = Datasheet.perSourceCard(docs, col("doc_id"), col("text"),
      col("src")).collect().map(_.toSeq).toSet
    val b = Datasheet.perSourceCard(docs.repartition(7), col("doc_id"),
      col("text"), col("src")).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("mixDrift: identical snapshots drift zero; a vanished source " +
      "contributes its one-sided JS term; shares track tokens") {
    val docs = Seq(
      ("a", "one two three four"), // 4 tokens
      ("b", "five six"),           // 2
      ("b", "seven eight")         // 2
    ).toDF("src", "text")
    val same = Datasheet.mixDrift(docs, docs, col("text"), col("src"))
      .collect()
    assert(same.forall(r => r.getDouble(7) === 0.0 && r.getLong(8) === 0L),
      "no drift between identical snapshots")
    // new snapshot loses source a entirely: old shares a=0.5 b=0.5,
    // new shares a=0 b=1
    val newer = docs.filter(col("src") =!= "a")
    val out = Datasheet.mixDrift(docs, newer, col("text"), col("src"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(4) === 0L) // new_tokens
    assert(out("a").getDouble(5) === 0.5)
    assert(out("a").getDouble(6) === 0.0)
    assert(out("a").getDouble(7) === -0.5)
    // one-sided term: 0.5 * p * ln(p / (p/2)) = 0.5 * 0.5 * ln 2
    assert(out("a").getLong(8) ===
      math.rint(0.5 * 0.5 * math.log(2.0) * 1e9).toLong)
    // b: p=0.5, q=1 -> 0.5*0.5*ln(0.5/0.75) + 0.5*1*ln(1/0.75)
    val bExp = 0.5 * 0.5 * math.log(0.5 / 0.75) +
      0.5 * 1.0 * math.log(1.0 / 0.75)
    assert(out("b").getLong(8) === math.rint(bExp * 1e9).toLong)
    // total JS of disjoint-support would be ln 2; this partial shift
    // stays strictly inside (0, ln 2)
    val totalJs = out.values.map(_.getLong(8)).sum
    assert(totalJs > 0L && totalJs < math.rint(math.log(2.0) * 1e9).toLong)
  }

  test("nearDupSourceMatrix: order-normalized source pairs, diagonal = " +
    "internal dup load") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
      .toDF("id_a", "id_b")
    val sources = Seq(1L -> "B", 2L -> "A", 3L -> "A", 4L -> "B",
      5L -> "A", 6L -> "A", 7L -> "C", 8L -> "B").toDF("id", "source")
    val got = Datasheet.nearDupSourceMatrix(pairs, sources)
      .as[(String, String, Long)].collect().toSet
    // (B,A) and (A,B) both normalize to (A,B); (A,A) is the diagonal
    assert(got === Set(("A", "B", 2L), ("A", "A", 1L), ("B", "C", 1L)))
  }

  test("ksDrift: exact max CDF gap with argmax ties to the smallest " +
    "value; empty side yields null ks") {
    val ref = Seq(1, 1, 2, 3).toDF("v")
    val cur = Seq(2, 3, 3, 4).toDF("v")
    val got = Datasheet.ksDrift(ref, cur, col("v")).collect().head
    // CDF gaps ×16: v1 |8-0|=8, v2 |12-4|=8, v3 |16-12|=4, v4 0 →
    // ks = 8/16 = 0.5, tie between v=1 and v=2 resolves to 1
    assert(got.getLong(0) === 4L && got.getLong(1) === 4L)
    assert(got.getDouble(2) === 0.5 && got.getLong(3) === 1L)
    val empty = Datasheet.ksDrift(ref, cur.limit(0), col("v"))
      .collect().head
    assert(empty.isNullAt(2))
    val same = Datasheet.ksDrift(ref, ref, col("v")).collect().head
    assert(same.getDouble(2) === 0.0)
  }

  test("ksDriftByGroup: per-group gaps are independent; empty-side " +
    "groups yield null") {
    val ref = Seq(("A", 1), ("A", 1), ("A", 2), ("A", 3),
      ("B", 5), ("B", 6), ("C", 9)).toDF("g", "v")
    val cur = Seq(("A", 2), ("A", 3), ("A", 3), ("A", 4),
      ("B", 5), ("B", 6)).toDF("g", "v")
    val got = Datasheet.ksDriftByGroup(ref, cur, col("v"), col("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    // A mirrors the global ksDrift fixture: ks = 0.5 at v = 1
    assert(got("A").getDouble(3) === 0.5 && got("A").getLong(4) === 1L)
    // B identical distributions → ks 0 (argmax tie → smallest v = 5)
    assert(got("B").getDouble(3) === 0.0 && got("B").getLong(4) === 5L)
    // C absent from cur → null ks
    assert(got("C").isNullAt(3))
  }

  test("novelGramsBySource: per-source novelty against a reference " +
    "snapshot; shared novel grams count for each source") {
    val ref = Seq((1L, "a b c d")).toDF("id", "text")
    val nw = Seq(
      ("X", "a b c d"),    // both grams known → 0 novel
      ("Y", "x y z w"),    // both grams novel
      ("Z", "x y z q"))    // "x y z" novel (shared with Y), "y z q" novel
      .toDF("source", "text")
    val got = Datasheet.novelGramsBySource(ref, nw, col("text"),
        col("source"))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("X") === ("X", 2L, 0L, 0.0))
    assert(got("Y") === ("Y", 2L, 2L, 1.0))
    assert(got("Z") === ("Z", 2L, 2L, 1.0))
  }

  test("dedupEffectiveSize: keep rates count cluster tokens at the rep") {
    // cluster {1,2,3} rep 1; singletons 4, 5
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L))
      .toDF("doc_id", "cluster_rep")
    val tokens = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 5L), (5L, 35L))
      .toDF("doc_id", "nt")
    val got = Datasheet.dedupEffectiveSize(clusters, tokens)
      .as[(Long, Long, Double, Long, Long, Double)].collect().head
    assert(got === ((5L, 3L, 0.6, 100L, 50L, 0.5)))
  }

  test("embeddingHealth: ragged dims, zero-norm rows, and exact norm " +
    "stats per group") {
    val embs = Seq(
      ("A", Array(3.0f, 4.0f)),  // ‖v‖² = 25
      ("A", Array(0.0f, 0.0f)),  // zero-norm
      ("B", Array(1.0f)),        // ragged: 1 dim
      ("B", Array(1.0f, 1.0f, 1.0f))) // 3 dims, ‖v‖² = 3
      .toDF("grp", "embedding")
    val got = Datasheet.embeddingHealth(embs, col("embedding"), col("grp"))
      .as[(String, Long, Int, Int, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("A") === ("A", 2L, 2, 2, 1L, 12.5, 0.0, 25.0))
    assert(got("B") === ("B", 2L, 1, 3, 0L, 2.0, 1.0, 3.0))
  }

  test("dedupEffectiveSizeBySource: keep rates per feed, straddles per source") {
    // srcA: docs 1,2 cluster at rep 1 (10+5 tokens) + singleton 3 (2);
    // srcB: doc 4 joins srcA's cluster (rep 1 straddles) + singleton 5
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 1L), (5L, 5L))
      .toDF("doc_id", "cluster_rep")
    val tokens = Seq((1L, 10L), (2L, 5L), (3L, 2L), (4L, 7L), (5L, 4L))
      .toDF("doc_id", "nt")
    val sources = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"),
      (5L, "B")).toDF("doc_id", "src")
    val got = Datasheet.dedupEffectiveSizeBySource(clusters, tokens,
        sources)
      .as[(String, Long, Long, Double, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // A: 3 docs, reps {1, 3}, 17 tokens, rep tokens 10+2=12
    assert(got("A") === ("A", 3L, 2L, 0.666667, 17L, 12L, 0.705882))
    // B: 2 docs, reps {1, 5} (1 straddles in), 11 tokens, rep tokens 4
    // (doc 4 is not its cluster's rep; rep 1 lives in A)
    assert(got("B") === ("B", 2L, 2L, 1.0, 11L, 4L, 0.363636))
  }

  test("robustOutliers: median/MAD ignore the outlier they flag") {
    // srcA values 1..9 plus 100: med 5.5, MAD 2.5, threshold 7.5 → only
    // the 100 flags (a mean/sigma screen would have its threshold
    // dragged to ~34 by the same point). srcB is constant except one
    // deviant: MAD 0 degrades to the epsilon band → exactly one flag.
    val rows = ((1 to 9).map(i => ("A", i)) :+ ("A", 100)) ++
      (Seq.fill(4)(("B", 7)) :+ ("B", 8))
    val df = rows.toDF("src", "v")
    val got = Datasheet.robustOutliers(df, col("v"), col("src"), z = 3.0)
      .as[(String, Long, Double, Double, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("A") === ("A", 10L, 5.5, 2.5, 1L, 0.1))
    assert(got("B") === ("B", 5L, 7.0, 0.0, 1L, 0.2))
    intercept[IllegalArgumentException](
      Datasheet.robustOutliers(df, col("v"), col("src"), z = 0.0))
  }
}
