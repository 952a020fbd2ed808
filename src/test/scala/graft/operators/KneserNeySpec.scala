package graft.operators

import graft.SparkSpec

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  // corpus: "a b a b" + "a c"
  // model: (a,b):2 (b,a):1 (a,c):1; ctx a:(c1 3, r1 2), b:(1, 1);
  // left-type l2 = 1 for each of a, b, c; T = 3 bigram types
  private def corpus() =
    Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")

  private def p(c12: Double, c1: Double, r1: Double, l2: Double,
      t: Double): Double =
    (c12 - 0.75) / c1 + 0.75 * r1 / c1 * (l2 / t)

  test("per-document micro-prob sums match the hand-built model") {
    val pAB = p(2, 3, 2, 1, 3)
    val pBA = p(1, 1, 1, 1, 3)
    val pAC = p(1, 3, 2, 1, 3)
    val expected = Map(
      1L -> (3L, 2 * math.floor(pAB * 1e9).toLong +
        math.floor(pBA * 1e9).toLong),
      2L -> (1L, math.floor(pAC * 1e9).toLong))
    val out = NgramLm.kneserNeySelfScore(corpus(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === expected)
  }

  test("interpolated KN is a proper distribution per context") {
    // over ALL continuations of context a (seen mass + the backoff
    // mass routed to every vocab type): sums to exactly 1 in reals
    val pAB = p(2, 3, 2, 1, 3)
    val pAC = p(1, 3, 2, 1, 3)
    val unseenA = 0.75 * 2 / 3.0 * (1 / 3.0) // w2 = a: c12 = 0
    assert(math.abs(pAB + pAC + unseenA - 1.0) < 1e-12)
  }

  test("documents with fewer than two tokens are absent") {
    val df = Seq((1L, "a b"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val ids = NgramLm.kneserNeySelfScore(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  test("deterministic under repartitioning") {
    val df = (1 to 60).map(i =>
      (i.toLong, s"w${i % 5} w${i % 7} w${i % 3} w${i % 5}"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      NgramLm.kneserNeySelfScore(d, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(run(df) === run(df.repartition(7)))
  }
}
