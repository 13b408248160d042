package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stupid Backoff trigram scoring (Brants et al. 2007): the three-level
  * formula on a hand-counted corpus, the held/train split contract, and
  * totality on OOV tokens. */
class BackoffSpec extends SparkSpec {
  import spark.implicits._

  // heldMod=5: ids 1–4 train, 5 and 10 held.
  // Train counts (hand-derived):
  //   trigrams: (a,b,c)=2 [ctx (a,b)=2], (b,c,d)=1 [ctx (b,c)=1]
  //   bigrams:  (a,b)=2, (b,c)=3, (c,d)=2; contexts a·=2, b·=3, c·=2
  //   unigrams: a=2, b=3, c=4, d=2 → N=11, V=4
  private val docs = Seq(
    (1L, "a b c"), (2L, "a b c"), (3L, "b c d"), (4L, "c d"),
    (5L, "a b c d x"), (10L, "a c d b")).toDF("doc_id", "text")

  private def run() =
    Vocab.stupidBackoffNll(docs, col("doc_id"), col("text"),
        alpha = 0.4, heldMod = 5)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_nll"))).toMap

  private def round4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("all three backoff levels score a hand-counted corpus") {
    val a = 0.4
    val out = run()
    // doc 5 "a b c d x": (a,b,c) seen 2/2; (b,c,d) seen 1/1;
    // (c,d,x) → trigram and bigram (d,x) unseen, x OOV → α²·(0+1)/(11+4)
    val d5 = Seq(math.log(2.0 / 2), math.log(1.0 / 1),
      math.log(a * a * 1 / 15.0))
    assert(out(5L)._1 === 3L)
    assert(out(5L)._2 === round4(-d5.sum / d5.size))
    // doc 10 "a c d b": (a,c,d) → trigram unseen, bigram (c,d)=2/c·=2
    // → α·(2/2); (c,d,b) → trigram and bigram (d,b) unseen, b seen 3
    // → α²·(3+1)/(11+4)
    val d10 = Seq(math.log(a * 2.0 / 2), math.log(a * a * 4 / 15.0))
    assert(out(10L)._1 === 2L)
    assert(out(10L)._2 === round4(-d10.sum / d10.size))
  }

  test("train docs and short docs are excluded from the output") {
    val out = run()
    assert(out.keySet === Set(5L, 10L)) // ids 1–4 are the count tables
    val short = Seq((5L, "a b"), (1L, "a b c")).toDF("doc_id", "text")
    assert(Vocab.stupidBackoffNll(short, col("doc_id"), col("text"))
      .count() === 0L) // held doc has no trigrams
  }

  test("scorer is total on fully-OOV held docs") {
    val oov = Seq((1L, "a b c"), (2L, "a b c"), (5L, "z z z z"))
      .toDF("doc_id", "text")
    val rows = Vocab.stupidBackoffNll(oov, col("doc_id"), col("text"))
      .collect()
    assert(rows.length === 1)
    val nll = rows(0).getAs[Double]("avg_nll")
    assert(!nll.isNaN && !nll.isInfinite && nll > 0)
  }
}
