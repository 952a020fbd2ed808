package graft.operators

import graft.SparkSpec

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("pmi matches the hand formula on a tiny corpus") {
    // token stream: "x y" x3 plus background tokens that never pair up
    val docs = Seq("x y", "x y", "x y", "x", "y", "z").toDF("text")
    val r = Cooccurrence.pmi(docs, "text", minPairCount = 1L, topK = 10)
      .as[(Int, String, String, Long, Long, Long, Double)].collect()
    assert(r.length == 1)
    val (rank, w1, w2, c12, c1, c2, pmi) = r.head
    assert((rank, w1, w2, c12, c1, c2) == (1, "x", "y", 3L, 4L, 4L))
    // N = 9 tokens total; pmi = ln(3 * 9 / (4 * 4))
    assert(math.abs(pmi - math.log(3.0 * 9.0 / 16.0)) < 1e-9)
  }

  test("minPairCount prunes, topK caps, rank is dense from 1") {
    val docs = Seq(
      "a b", "a b", "a b", // a-b x3
      "c d", "c d",        // c-d x2
      "e f"                // e-f x1 — pruned at minPairCount=2
    ).toDF("text")
    val r = Cooccurrence.pmi(docs, "text", minPairCount = 2L, topK = 10)
      .as[(Int, String, String, Long, Long, Long, Double)].collect()
      .sortBy(_._1)
    assert(r.map(x => (x._2, x._3)).toSet == Set(("a", "b"), ("c", "d")))
    assert(r.map(_._1).toSeq == Seq(1, 2))
    val top1 = Cooccurrence.pmi(docs, "text", minPairCount = 2L, topK = 1)
      .as[(Int, String, String, Long, Long, Long, Double)].collect()
    assert(top1.length == 1 && top1.head._1 == 1)
  }

  test("normalization folds case and whitespace before pairing") {
    val docs = Seq("New  YORK", "new york").toDF("text")
    val r = Cooccurrence.pmi(docs, "text", minPairCount = 1L, topK = 10)
      .as[(Int, String, String, Long, Long, Long, Double)].collect()
    assert(r.length == 1)
    assert((r.head._2, r.head._3, r.head._4) == ("new", "york", 2L))
  }

  test("rarer pairs with equal joint count rank higher (PMI ordering)") {
    // j-k and m-n both co-occur twice, but m/n also appear alone —
    // higher unigram mass lowers their PMI below j-k's.
    val docs = Seq("j k", "j k", "m n", "m n", "m", "n").toDF("text")
    val r = Cooccurrence.pmi(docs, "text", minPairCount = 2L, topK = 10)
      .as[(Int, String, String, Long, Long, Long, Double)].collect()
      .sortBy(_._1)
    assert(r.map(x => (x._2, x._3)).toSeq == Seq(("j", "k"), ("m", "n")))
    assert(r(0)._7 > r(1)._7)
  }

  test("single-token docs add unigram mass but no pairs") {
    val withSingles = Seq("p q", "p", "p", "p").toDF("text")
    val r = Cooccurrence.pmi(withSingles, "text", 1L, 10)
      .as[(Int, String, String, Long, Long, Long, Double)].collect()
    assert(r.length == 1)
    // c1 counts ALL p occurrences (4), not just paired ones
    assert((r.head._4, r.head._5, r.head._6) == (1L, 4L, 1L))
  }
}
