package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training: the Viterbi DP is verified against an
  * INDEPENDENT brute-force enumeration of every segmentation (the
  * CountMinSpec defense — pipeline and from-scratch implementation must
  * agree), plus training-dynamics and closure properties. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** All segmentations of `w` into pieces of length <= maxLen. */
  private def allSegs(w: String, maxLen: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, w.length)).flatMap(k =>
      allSegs(w.drop(k), maxLen).map(w.take(k) +: _))

  /** Brute-force best segmentation under the SAME scoring and
    * tie-break. The DP resolves score ties by preferring the longer
    * LAST piece, recursively toward the front — equivalently: among
    * max-score segmentations, the lexicographically greatest reversed
    * piece-length sequence wins. */
  private def bruteBest(w: String, lp: Map[String, Double],
      maxLen: Int): Seq[String] = {
    def sc(seg: Seq[String]): Double = seg.map(p =>
      lp.getOrElse(p,
        if (p.length == 1) -100.0 else Double.NegativeInfinity)).sum
    val cands = allSegs(w, maxLen).filter(s => sc(s) > Double.NegativeInfinity)
    val best = sc(cands.maxBy(sc))
    cands.filter(s => sc(s) == best)
      .maxBy(s => s.reverse.map(p => ('a' + p.length).toChar).mkString)
  }

  private val vocab = Map(
    "ab" -> math.log(0.3), "abc" -> math.log(0.2), "c" -> math.log(0.1),
    "a" -> math.log(0.15), "b" -> math.log(0.15), "bc" -> math.log(0.05),
    "abcd" -> math.log(0.05))

  test("viterbi equals brute-force enumeration on every test word") {
    val words = Seq("abc", "abcabc", "ababab", "abcd", "abcdc",
      "cab", "bca", "aaaa", "abcbcab", "x", "axb", "abxcd")
    words.foreach { w =>
      val got = UnigramLm.viterbiOne(w, vocab, 4)
      val want = bruteBest(w, vocab, 4)
      assert(got == want, s"word=$w got=$got want=$want")
      assert(got.mkString == w, s"segmentation must concatenate to $w")
    }
  }

  test("unknown characters segment via the UNK floor (closure)") {
    val got = UnigramLm.viterbiOne("zq", Map("a" -> -1.0), 4)
    assert(got == Seq("z", "q"))
  }

  test("training a repetitive corpus promotes the repeated piece") {
    val docs = Seq.fill(50)("ababab ababab cd").toDF("text")
    val v = UnigramLm.train(docs, "text", vocabSize = 12,
      maxPieceLen = 6, maxSeed = 64, emRounds = 2)
    val pieces = v.select("piece").as[String].collect().toSet
    // the dominant word itself survives pruning as one piece
    assert(pieces.contains("ababab"))
    val segs = UnigramLm.segmentWords(
      Seq("ababab").toDF("word"), v, maxPieceLen = 6)
      .select("pieces").as[Seq[String]].head()
    assert(segs == Seq("ababab"))
    // closure chars are never pruned
    assert(Set("a", "b", "c", "d").subsetOf(pieces))
  }

  test("seedVocab counts substrings weighted by word frequency") {
    val wc = Seq(("abab", 3L), ("ba", 2L)).toDF("word", "freq")
    val seeds = UnigramLm.seedVocab(wc, maxPieceLen = 3, maxSeed = 100)
      .as[(String, Long)].collect().toMap
    // "ab" occurs twice in abab (freq 3) -> 6; "ba" once in abab (3) +
    // once as the word ba (2) -> 5
    assert(seeds("ab") === 6L)
    assert(seeds("ba") === 5L)
    assert(seeds("aba") === 3L)
    assert(seeds("bab") === 3L)
    assert(!seeds.contains("a")) // single chars are train()'s job
  }

  test("encodeTokens joins the distinct-word segmentation through") {
    val docs = Seq((1L, "ababab cd"), (2L, "cd cd")).toDF("id", "text")
    val v = UnigramLm.train(docs, "text", vocabSize = 10,
      maxPieceLen = 6, maxSeed = 64)
    val toks = UnigramLm.encodeTokens(docs, "id", "text", v)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    // doc 2 is two 'cd' words; each segments to the same piece count
    val perCd = toks(2L) / 2
    assert(toks(2L) % 2 === 0L && perCd >= 1L)
  }
}
