package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE walkthrough corpus: hug x10, pug x5, pun x12,
  // bun x4, hugs x5 — merge order is hand-computable. One row per word
  // occurrence, so repartitioning genuinely redistributes the data the
  // pair-count aggregation consumes.
  private def corpus = {
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("merge sequence matches the hand computation") {
    // pair counts: (u,g)=20 -> ug; then (u,n)=16 -> un; then (h,ug)=15
    val (merges, vocab) = BpeTrainer.train(corpus, "text", 3)
    val got = merges.orderBy("rank")
      .as[(Int, String, String)].collect().toSeq
    assert(got == Seq((0, "u", "g"), (1, "u", "n"), (2, "h", "ug")))
    val segs = vocab.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(segs("hug") == Seq("hug"))
    assert(segs("pug") == Seq("p", "ug"))
    assert(segs("pun") == Seq("p", "un"))
    assert(segs("bun") == Seq("b", "un"))
    assert(segs("hugs") == Seq("hug", "s"))
    // word frequencies survive the rewrite rounds
    val freqs = vocab.select("word", "freq").as[(String, Long)].collect().toMap
    assert(freqs == Map("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
      "bun" -> 4L, "hugs" -> 5L))
  }

  test("training is deterministic across layouts") {
    def run(df: org.apache.spark.sql.DataFrame) = {
      val (m, _) = BpeTrainer.train(df, "text", 4)
      m.orderBy("rank").as[(Int, String, String)].collect().toSeq
    }
    assert(run(corpus) == run(corpus.repartition(7)))
  }

  test("trainBatched equals exact greedy on non-interacting merges") {
    // disjoint-alphabet words with strictly decreasing counts: the top
    // pairs (a,b) > (c,d) > (e,f) > (g,h) share no symbols, so the
    // batched prefix acceptance IS the greedy sequence
    val words = Seq.fill(9)("ab") ++ Seq.fill(7)("cd") ++
      Seq.fill(5)("ef") ++ Seq.fill(3)("gh")
    val d = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val (mExact, vExact) = BpeTrainer.train(d, "text", 4)
    val (mBatch, vBatch) = BpeTrainer.trainBatched(d, "text", 4, batch = 4)
    assert(mBatch.orderBy("rank").as[(Int, String, String)].collect().toSeq
      == mExact.orderBy("rank").as[(Int, String, String)].collect().toSeq)
    def segs(v: org.apache.spark.sql.DataFrame) =
      v.select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(segs(vBatch) == segs(vExact))
  }

  test("trainBatched prefix rule stops at the first interacting pair") {
    // hug corpus: after (u,g) the next top pair (u,n) SHARES u — the
    // round must stop there, making batched training replay the exact
    // greedy sequence merge for merge
    val (mExact, _) = BpeTrainer.train(corpus, "text", 3)
    val (mBatch, _) = BpeTrainer.trainBatched(corpus, "text", 3, batch = 3)
    assert(mBatch.orderBy("rank").as[(Int, String, String)].collect().toSeq
      == mExact.orderBy("rank").as[(Int, String, String)].collect().toSeq)
  }

  test("merge application is greedy left-to-right") {
    // "aaaa" under (a,a) must become [aa, aa], never [aa, a, a]
    val d = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val (merges, vocab) = BpeTrainer.train(d, "text", 1)
    assert(merges.as[(Int, String, String)].collect().toSeq ==
      Seq((0, "a", "a")))
    val syms = vocab.select("syms").as[Seq[String]].collect().head
    assert(syms == Seq("aa", "aa"))
  }

  test("training stops early when no pair remains") {
    val d = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val (merges, _) = BpeTrainer.train(d, "text", 5)
    assert(merges.count() == 0) // all words are single symbols
  }

  test("segmentWords replays merges: trained words reproduce their stored syms") {
    val (merges, vocab) = BpeTrainer.train(corpus, "text", 3)
    val replayed = BpeTrainer.segmentWords(
        vocab.select("word"), merges)
      .as[(String, Seq[String])].collect().toMap
    val stored = vocab.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(replayed == stored)
  }

  test("encodeTokens gives OOV words true BPE treatment, not char soup") {
    val (merges, vocab) = BpeTrainer.train(corpus, "text", 3)
    // "ugs" never appeared in training, but its subwords did: the merge
    // replay must produce [ug, s], and wholly-unknown "xy" falls through
    // to characters because no merge applies
    val doc = Seq((9L, "hug pun ugs xy")).toDF("doc_id", "text")
    val toks = BpeTrainer.encodeTokens(doc, "doc_id", "text", vocab, merges)
      .select("token").as[String].collect().sorted.toSeq
    assert(toks == Seq("hug", "p", "un", "ug", "s", "x", "y").sorted)
  }

  test("token counts over the real corpus shrink as merges accumulate") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def total(nMerges: Int): Long = {
      val (merges, vocab) = BpeTrainer.train(docs, "text", nMerges)
      BpeTrainer.encodeTokens(docs, "doc_id", "text", vocab, merges).count()
    }
    val t0 = total(0)
    val t10 = total(10)
    info(s"real-corpus token count: 0 merges $t0, 10 merges $t10")
    // every applied merge strictly reduces the count of its pair's
    // occurrences, so more merges can only shrink the stream
    assert(t10 < t0)
  }
}
