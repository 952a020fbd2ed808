package graft.operators

import graft.SparkSpec

/** Chunking.slidingChunks — window layout, overlap, short tails, and the
  * single-chunk degenerate cases. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, maxWords: Int, overlap: Int) =
    Chunking.slidingChunks(
        Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", maxWords, overlap)
      .orderBy("chunk_no")
      .select($"chunk_text", $"n_chunk_words")
      .as[(String, Int)].collect().toSeq

  test("windows advance by stride and share the overlap") {
    val got = chunks("w1 w2 w3 w4 w5 w6 w7", maxWords = 4, overlap = 1)
    // stride 3: [w1..w4], [w4..w7]
    assert(got == Seq(("w1 w2 w3 w4", 4), ("w4 w5 w6 w7", 4)))
  }

  test("the last chunk may be short; every word is covered") {
    val got = chunks("a b c d e", maxWords = 4, overlap = 1)
    // stride 3: [a b c d], [d e]
    assert(got == Seq(("a b c d", 4), ("d e", 2)))
  }

  test("zero overlap is plain fixed-width chunking") {
    val got = chunks("a b c d e", maxWords = 2, overlap = 0)
    assert(got == Seq(("a b", 2), ("c d", 2), ("e", 1)))
  }

  test("short and empty documents yield exactly one chunk") {
    assert(chunks("only three words", 10, 4) ==
      Seq(("only three words", 3)))
    assert(chunks("", 10, 4) == Seq(("", 0)))
    assert(chunks("   ", 10, 4) == Seq(("", 0)))
  }

  test("no spurious trailing window when the stride lands exactly") {
    // 6 words, maxWords 4, overlap 1, stride 3: (6-1+2)/3 = 2 chunks —
    // [1..4], [4..6]; a naive ceil(n/stride) would emit a third window
    val got = chunks("a b c d e f", 4, 1)
    assert(got == Seq(("a b c d", 4), ("d e f", 3)))
  }

  test("invalid parameters refuse loudly") {
    intercept[IllegalArgumentException](chunks("a", 0, 0))
    intercept[IllegalArgumentException](chunks("a", 4, 4))
    intercept[IllegalArgumentException](chunks("a", 4, -1))
  }
}
