package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Vocab induction (BPE pair counts) and the bigram-MLE NLL signal. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("topPairs counts adjacent pairs and ranks with lexicographic ties") {
    val docs = Seq("a b a b", "b a", "x").toDF("text")
    val rows = Vocab.topPairs(docs, col("text"), k = 10).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("l_tok"),
        r.getAs[String]("r_tok"), r.getAs[Long]("n")))
    // pairs: (a,b)x2, (b,a)x2 ("a b a b" has b->a once, plus doc2) — tie
    // broken lexicographically; single-token doc contributes nothing
    assert(rows.toSeq === Seq((1, "a", "b", 2L), (2, "b", "a", 2L)))
  }

  test("topPairs plans a distributed top-k, not a global window") {
    val docs = Seq("a b c d e f g").toDF("text")
    val plan = Vocab.topPairs(docs, col("text"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    // the rank-minting window must sit ABOVE the limit (k rows), i.e.
    // appear before TakeOrderedAndProject in the tree print — a window
    // below it would drag the whole pair-count table into one task
    assert(plan.indexOf("Window") < plan.indexOf("TakeOrderedAndProject"),
      s"the only window must consume the k-limited rows:\n$plan")
  }

  test("bigramNll matches a hand-computed corpus") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val rows = Vocab.bigramNll(docs, col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))).toMap
    // C(a,b)=2, C(a,c)=1, Cleft(a)=3
    assert(rows(1L) === ((1L, 0.4055))) // -ln(2/3)
    assert(rows(2L) === ((1L, 0.4055)))
    assert(rows(3L) === ((1L, 1.0986))) // -ln(1/3)
  }

  test("bigramNll excludes docs with fewer than two tokens") {
    val docs = Seq((1L, "only"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val ids = Vocab.bigramNll(docs, col("doc_id"), col("text"))
      .select("id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }

  test("trigramNll matches a hand-computed add-k corpus") {
    val docs = Seq((1L, "a b a b a"), (2L, "a b c")).toDF("doc_id", "text")
    val rows = Vocab.trigramNll(docs, col("doc_id"), col("text"), addK = 0.5)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_nll"))).toMap
    // trigram counts: (a,b,a)=2, (b,a,b)=1, (a,b,c)=1; contexts:
    // (a,b)=3, (b,a)=1; V=3, k=0.5:
    //   P(aba) = 2.5/4.5, P(bab) = 1.5/2.5, P(abc) = 1.5/4.5
    // doc 1 = -(2 ln(2.5/4.5) + ln(1.5/2.5)) / 3, doc 2 = -ln(1.5/4.5)
    assert(rows(1L) === ((3L, 0.5621)))
    assert(rows(2L) === ((1L, 1.0986)))
  }

  test("trigramNll excludes docs with fewer than three tokens") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "x y z")).toDF("doc_id", "text")
    val ids = Vocab.trigramNll(docs, col("doc_id"), col("text"))
      .select("id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }

  test("bpeTrain: multi-round merges match a hand computation") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val m = Vocab.bpeTrain(docs, col("text"), rounds = 3)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    // r1: (a,b)x3 -> "ab"; r2 over [ab ab c],[ab c d]: (ab,c)x2 -> "abc";
    // r3 over [ab abc],[abc d]: tie at n=1, (ab,abc) < (abc,d) lex
    assert(m === Seq((1, "a", "b", 3L), (2, "ab", "c", 2L),
      (3, "ab", "abc", 1L)))
  }

  test("bpeTrain: greedy left-to-right non-overlapping merge (a a a)") {
    val docs = Seq((1L, "a a a")).toDF("doc_id", "text")
    val m = Vocab.bpeTrain(docs, col("text"), rounds = 2)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    // round 1 counts (a,a)=2 but merges only the FIRST occurrence ->
    // [aa, a]; round 2 merges (aa, a)
    assert(m === Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    val docs = Seq((1L, "x y"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val m = Vocab.bpeTrain(docs, col("text"), rounds = 5)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    // r1 merges (x,y); r2 has only single-token docs -> exhausted
    assert(m === Seq((1, "x", "y", 1L)))
  }

  test("bpeTrain (incremental delta) equals bpeTrainRecount on varied corpora") {
    // the delta-maintained count table must track the full recount
    // bit-exactly through repeats, overlaps (a a a), ties, early
    // exhaustion, and pairs whose count hits zero mid-training
    val corpora = Seq(
      Seq("a b a b c", "a b c d", "b c a"),
      Seq("a a a a", "a a"),
      Seq("x y x y x", "y x y", "z"),
      Seq("p q r p q r p q", "q r p", "r p q"),
      Seq("m n", "n m", "m n m n", "solo", ""))
    for ((texts, ci) <- corpora.zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // driver-resident count table (the default regime)…
      val incDriver = Vocab.bpeTrain(docs, col("text"), rounds = 6)
        .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
      // …the distributed count table (maxDriverPairs = 0 forces the
      // above-ceiling regime)…
      val incDist = Vocab.bpeTrain(docs, col("text"), rounds = 6,
          maxDriverPairs = 0)
        .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
      // …and the independently-derived full recount must all agree
      val rec = Vocab.bpeTrainRecount(docs, col("text"), rounds = 6)
        .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
      assert(incDriver === rec, s"corpus $ci: driver-delta diverged from recount")
      assert(incDist === rec, s"corpus $ci: distributed-delta diverged from recount")
    }
  }

  test("bpeTrain leaves no cached state behind") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    Vocab.bpeTrain(docs, col("text"), rounds = 3).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "bpeTrain must unpersist every generation it pins")
  }

  test("bpeEncode applies trained merges in order, counts both sides") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c d"), (3L, "")).toDF("doc_id", "text")
    val merges = Vocab.bpeTrain(docs, col("text"), rounds = 2)
      .orderBy("round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges === Seq(("a", "b"), ("ab", "c")))
    val enc = Vocab.bpeEncode(docs, col("doc_id"), col("text"), merges)
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    // doc1: [a b a b c] -> [ab ab c] -> [ab abc]: 5 raw, 2 bpe
    // doc2: [a b c d] -> [ab c d] -> [abc d]: 4 raw, 2 bpe
    // doc3: empty -> excluded
    assert(enc === Seq((1L, 5L, 2L, 2.5), (2L, 4L, 2L, 2.0)))
  }

  test("bpeEncode with no merges is the identity token count") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val enc = Vocab.bpeEncode(docs, col("doc_id"), col("text"), Seq.empty)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(enc === Seq((1L, 3L, 3L, 1.0)))
  }

  test("pmiCollocations ranks above-chance pairs over raw-frequency pairs") {
    // (san, francisco) and (of, the) are equally frequent (6 each), but
    // 'of'/'the' are 9-count tokens while 'san'/'francisco' occur ONLY
    // together — PMI must rank the true collocation first. Hand values:
    // Nu=36 tokens, Np=18 pairs; pmi(san,francisco)=ln 12, the
    // lower-count (of,cat)/(the,dog) = ln 8 outrank the frequent
    // (of,the) = ln 16/3.
    val docs = (Seq.fill(6)("san francisco") ++ Seq.fill(6)("of the") ++
      Seq.fill(3)("of cat") ++ Seq.fill(3)("the dog")).toDF("text")
    val rows = Vocab.pmiCollocations(docs, col("text"), k = 10,
        minCount = 3)
      .as[(Int, String, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (1, "san", "francisco", 6L, 2.4849),
      (2, "of", "cat", 3L, 2.0794),
      (3, "the", "dog", 3L, 2.0794),
      (4, "of", "the", 6L, 1.674)))
  }

  test("pmiCollocations minCount suppresses the hapax-pair PMI explosion") {
    val docs = (Seq.fill(5)("a b") :+ "rare gem").toDF("text")
    val rows = Vocab.pmiCollocations(docs, col("text"), k = 10,
        minCount = 2)
      .as[(Int, String, String, Long, Double)].collect().toSeq
    assert(rows.map(_._2).toSet === Set("a"),
      s"hapax pair must be cut, got $rows")
    intercept[IllegalArgumentException](
      Vocab.pmiCollocations(docs, col("text"), k = 0, minCount = 1))
  }
}
