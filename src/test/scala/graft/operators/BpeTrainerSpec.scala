package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE walkthrough corpus: hug x10, pug x5, pun x12,
  // bun x4, hugs x5 — merge order is hand-computable
  private def corpus = {
    val text = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("merge sequence matches the hand computation") {
    // pair counts: (u,g)=20 -> ug; then (u,n)=16 -> un; then (h,ug)=15
    val (merges, vocab) = BpeTrainer.train(corpus, "doc_id", "text", 3)
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
      val (m, _) = BpeTrainer.train(df, "doc_id", "text", 4)
      m.orderBy("rank").as[(Int, String, String)].collect().toSeq
    }
    assert(run(corpus) == run(corpus.repartition(7)))
  }

  test("merge application is greedy left-to-right") {
    // "aaaa" under (a,a) must become [aa, aa], never [aa, a, a]
    val d = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val (merges, vocab) = BpeTrainer.train(d, "doc_id", "text", 1)
    assert(merges.as[(Int, String, String)].collect().toSeq ==
      Seq((0, "a", "a")))
    val syms = vocab.select("syms").as[Seq[String]].collect().head
    assert(syms == Seq("aa", "aa"))
  }

  test("training stops early when no pair remains") {
    val d = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val (merges, _) = BpeTrainer.train(d, "doc_id", "text", 5)
    assert(merges.count() == 0) // all words are single symbols
  }

  test("encodeTokens joins trained segmentations, chars for OOV") {
    val (_, vocab) = BpeTrainer.train(corpus, "doc_id", "text", 3)
    val doc = Seq((9L, "hug pun xy")).toDF("doc_id", "text")
    val toks = BpeTrainer.encodeTokens(doc, "doc_id", "text", vocab)
      .select("token").as[String].collect().sorted.toSeq
    assert(toks == Seq("hug", "p", "un", "x", "y").sorted)
  }

  test("token counts over the real corpus shrink as merges accumulate") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def total(nMerges: Int): Long = {
      val (_, vocab) = BpeTrainer.train(docs, "doc_id", "text", nMerges)
      BpeTrainer.encodeTokens(docs, "doc_id", "text", vocab).count()
    }
    val t0 = total(0)
    val t10 = total(10)
    info(s"real-corpus token count: 0 merges $t0, 10 merges $t10")
    // every applied merge strictly reduces the count of its pair's
    // occurrences, so more merges can only shrink the stream
    assert(t10 < t0)
  }
}
