package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token-window chunking: exact windows, overlap, tails, edge cases. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, size: Int, overlap: Int) =
    Chunk.tokenChunks(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), size, overlap)
      .orderBy("chunk_idx")
      .as[(Long, Int, Int, String)].collect().toSeq

  test("non-overlapping windows with a short tail") {
    assert(chunks("a b c d e f g", 3, 0) === Seq(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "d e f"), (1L, 2, 1, "g")))
  }

  test("overlapping windows stride by size - overlap") {
    assert(chunks("a b c d e f g", 4, 2) === Seq(
      (1L, 0, 4, "a b c d"), (1L, 1, 4, "c d e f"), (1L, 2, 3, "e f g")))
  }

  test("doc shorter than one window is a single whole chunk") {
    assert(chunks("a b", 5, 2) === Seq((1L, 0, 2, "a b")))
  }

  test("exact multiple leaves no empty tail chunk") {
    assert(chunks("a b c d", 2, 0) === Seq(
      (1L, 0, 2, "a b"), (1L, 1, 2, "c d")))
    // overlap case: n=5, size=3, stride=2 -> chunks at 0,2: [abc],[cde]
    assert(chunks("a b c d e", 3, 1) === Seq(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "c d e")))
  }

  test("empty and whitespace-only docs yield nothing") {
    val out = Chunk.tokenChunks(
      Seq((1L, ""), (2L, "   "), (3L, "x")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), 4, 1)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out === Seq((3L, 0, 1, "x")))
  }

  test("invalid size/overlap rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Chunk.tokenChunks(df, col("doc_id"), col("text"), 0, 0))
    intercept[IllegalArgumentException](
      Chunk.tokenChunks(df, col("doc_id"), col("text"), 4, 4))
  }

  test("map-side only: no exchange in the plan") {
    val p = Chunk.tokenChunks(Seq((1L, "a b c")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 2, 0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  // ------------------------- content-defined chunking

  private def cutTok(tok: String, divisor: Int, remainder: Int): Boolean =
    graft.functions.HashKernels.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(tok),
      31L, 1000000007L) % divisor == remainder

  private def cdc(text: String, divisor: Int, remainder: Int) =
    Chunk.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), divisor, remainder)
      .orderBy("chunk_idx")
      .as[(Long, Int, Int, String, Long)].collect().toSeq

  test("cdc chunks tile the document; every non-final chunk ends at a cut") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val d = 3; val r = 1
    val out = cdc(text, d, r)
    // tiling: re-joining the chunks reproduces the token stream
    assert(out.map(_._4).mkString(" ") === text)
    assert(out.map(_._2) === out.indices.map(identity))
    // boundary law: a chunk's last token is a cut iff the chunk is
    // non-final (or the doc's last token happens to be a cut); interior
    // tokens are never cuts
    out.foreach { case (_, idx, _, ctext, _) =>
      val toks = ctext.split(" ")
      toks.init.foreach(t =>
        assert(!cutTok(t, d, r), s"interior cut token '$t' in chunk $idx"))
      if (idx < out.size - 1)
        assert(cutTok(toks.last, d, r),
          s"non-final chunk $idx does not end at a cut: '$ctext'")
    }
  }

  test("cdc boundaries realign after a head edit (fixed windows would shift)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val d = 3; val r = 0
    val baseOut = cdc(base, d, r)
    assume(baseOut.size >= 3, "fixture must produce >= 3 chunks")
    // 2-token insertion: coprime with the fixed window size below, so
    // the fixed-window contrast can't accidentally realign
    val shifted = cdc("inserted tokens " + base, d, r)
    // every base chunk after the first boundary keeps its hash verbatim
    val survivors = baseOut.drop(1).map(_._5).toSet
    val shiftedHashes = shifted.map(_._5).toSet
    assert(survivors.subsetOf(shiftedHashes),
      s"tail chunks must survive a head insertion: missing " +
        s"${survivors -- shiftedHashes}")
    // the contrast: fixed windows of the same expected size share nothing
    val fix = Chunk.tokenChunks(Seq((1L, base)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), d, 0)
      .select(col("chunk_text")).as[String].collect().toSet
    val fixShift = Chunk.tokenChunks(
        Seq((1L, "inserted tokens " + base)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), d, 0)
      .select(col("chunk_text")).as[String].collect().toSet
    assert((fix intersect fixShift).size < survivors.size,
      "fixture too kind: fixed windows survived the shift as well as cdc")
  }

  test("cdc: a trailing cut token yields no empty chunk; blank docs vanish") {
    // find a word that IS a cut for (5, 2) to plant at the end
    val word = Iterator.from(0).map(i => s"w$i")
      .find(cutTok(_, 5, 2)).get
    val out = cdc(s"aaa bbb $word", 5, 2)
    assert(out.map(_._3).sum === 3)
    assert(out.forall(_._3 > 0))
    assert(out.last._4.endsWith(word))
    assert(cdc("   ", 5, 2).isEmpty)
  }

  test("cdc is map-side: no exchange in the plan") {
    val p = Chunk.cdcChunks(Seq((1L, "a b c")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 4, 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"cdc chunking must not shuffle:\n$p")
  }
}
