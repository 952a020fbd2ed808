package graft.operators

import graft.SparkSpec

class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("a single group IS the corpus: divergence exactly 0") {
    val docs = Seq((1L, "alpha beta beta", "s1"), (2L, "alpha gamma", "s1"))
      .toDF("doc_id", "text", "source")
    val out = Divergence.jsAgainstCorpus(docs, "source", "text")
      .as[(String, Long, Double)].collect()
    assert(out.length == 1)
    assert(out.head._2 == 5L)
    assert(out.head._3 == 0.0) // p == q term-wise -> every ln(1) = 0
  }

  test("disjoint equal-mass groups hit the closed-form corpus JS value") {
    // each group's tokens are exclusive and both hold half the corpus:
    // per group JS(P, corpus) = 0.5·ln(4/3) + 0.25·ln(2/3) + 0.25·ln 2
    val docs = Seq((1L, "aa aa aa aa", "s1"), (2L, "bb bb bb bb", "s2"))
      .toDF("doc_id", "text", "source")
    val expected = 0.5 * math.log(4.0 / 3.0) +
      0.25 * math.log(2.0 / 3.0) + 0.25 * math.log(2.0)
    val out = Divergence.jsAgainstCorpus(docs, "source", "text")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(out("s1") - expected) < 1e-9, s"got ${out("s1")}")
    assert(math.abs(out("s2") - expected) < 1e-9)
  }

  test("a drifted group scores above a representative one") {
    val base = (0 until 20).map(i =>
      (i.toLong, "common words shared by every source", "s1"))
    val similar = (100 until 120).map(i =>
      (i.toLong, "common words shared by every source", "s2"))
    val drifted = (200 until 220).map(i =>
      (i.toLong, "totally different vocabulary entirely", "s3"))
    val docs = (base ++ similar ++ drifted).toDF("doc_id", "text", "source")
    val out = Divergence.jsAgainstCorpus(docs, "source", "text")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out("s3") > out("s2") + 0.05,
      s"drifted ${out("s3")} vs similar ${out("s2")}")
    assert(out("s2") >= 0.0 && out("s3") <= math.log(2.0) + 1e-9)
  }

  private def runPsi(a: Seq[Long], e: Seq[Long]) =
    Divergence.psi(a.toDF("bin"), e.toDF("bin"), "bin")
      .as[(Long, Long, Long, Double)].head()

  test("psi: hand-computed add-one smoothed two-bin case") {
    // actual bin1 x3; expected bin1 x1, bin2 x1 -> na=3 ne=2 nb=2
    // pa = (4/5, 1/5), pe = (2/4, 2/4)
    // psi = 0.3*ln(1.6) - 0.3*ln(0.4) = 0.3*ln(4)
    val out = runPsi(Seq(1L, 1L, 1L), Seq(1L, 2L))
    assert((out._1, out._2, out._3) === ((3L, 2L, 2L)))
    assert(math.abs(out._4 - 0.3 * math.log(4.0)) < 1e-9)
  }

  test("psi: identical populations score exactly zero") {
    val pop = Seq(1L, 1L, 2L, 3L, 3L, 3L)
    assert(runPsi(pop, pop)._4 === 0.0)
  }

  test("psi: a bin absent from one side is smoothed, never NaN/inf") {
    val out = runPsi(Seq(1L, 1L, 1L, 1L), Seq(9L, 9L, 9L, 9L))
    assert(!out._4.isNaN && !out._4.isInfinite && out._4 > 0.5)
  }
}
