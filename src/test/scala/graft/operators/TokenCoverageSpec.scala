package graft.operators

import graft.SparkSpec

class TokenCoverageSpec extends SparkSpec {
  import spark.implicits._

  test("oovReport counts tokens and OOV mass per group") {
    // corpus counts: "the"=4, "cat"=2, "dog"=1, "rare"=1
    val docs = Seq(
      ("a", "the cat  the dog"),
      ("a", "THE cat"),
      ("b", "the rare")).toDF("src", "text")
    val out = TokenCoverage.oovReport(docs, "src", "text", minCount = 2L)
      .orderBy("src")
      .as[(String, Long, Long, Double)].collect().toSeq
    // vocab = {the, cat}; a: 6 tokens, 1 oov (dog); b: 2 tokens, 1 oov
    assert(out === Seq(
      ("a", 6L, 1L, 1.0 / 6.0),
      ("b", 2L, 1L, 0.5)))
  }

  test("null groups are dropped; empty text contributes nothing") {
    val docs = Seq(
      (null.asInstanceOf[String], "the the"),
      ("a", "   "),
      ("a", "x")).toDF("src", "text")
    val out = TokenCoverage.oovReport(docs, "src", "text", minCount = 1L)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("a", 1L, 0L, 0.0)))
  }

  test("temperatureMixWeights flattens toward uniform as T grows") {
    val docs = (1 to 90).map(_ => "en") ++ (1 to 10).map(_ => "de")
    val df = docs.toDF("lang")
    val t2 = Sampling.temperatureMixWeights(df, "lang", 2.0)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // p_raw preserved exactly
    assert(t2("en")._3 === 0.9 && t2("de")._3 === 0.1)
    // sqrt scaling: en 9/10 -> 3/4, de 1/10 -> 1/4 (sqrt90 : sqrt10 = 3:1)
    assert(math.abs(t2("en")._4 - 0.75) < 1e-9)
    assert(math.abs(t2("de")._4 - 0.25) < 1e-9)
    // probabilities sum to 1 (within decimal-rounding dust)
    assert(math.abs(t2.values.map(_._4).sum - 1.0) < 1e-9)
    // higher temperature flattens further
    val t4 = Sampling.temperatureMixWeights(df, "lang", 4.0)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(t4("de") > t2("de")._4 && t4("de") < 0.5)
  }
}
