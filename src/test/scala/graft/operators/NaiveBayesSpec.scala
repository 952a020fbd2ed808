package graft.operators

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spam", "buy cheap pills now"),
    (2L, "spam", "cheap pills cheap deals"),
    (3L, "ham", "meeting notes for tomorrow"),
    (4L, "ham", "lunch tomorrow with the team"),
    (5L, "ham", "notes from the team meeting")
  ).toDF("doc_id", "label", "text")

  test("separable classes classify themselves correctly") {
    val out = NaiveBayes.classify(docs, "doc_id", "label", "text")
      .select("doc_id", "label", "pred")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(out.forall { case (_, l, p) => l == p },
      s"resubstitution must be perfect on separable data: $out")
  }

  test("log-posteriors match a hand computation (add-one smoothing)") {
    // vocab V = 14 distinct tokens (5 spam-only + 9 ham-only); spam
    // token mass N = 8. doc 1 "buy cheap pills now": spam counts
    // (1,3,2,1) → score = ln(2/5) + ln(2/22)+ln(4/22)+ln(3/22)+ln(2/22)
    val out = NaiveBayes.classify(docs, "doc_id", "label", "text")
      .filter($"doc_id" === 1L).select("pred", "score")
      .as[(String, Double)].head()
    val expected = math.log(2.0 / 5.0) + math.log(2.0 / 22.0) +
      math.log(4.0 / 22.0) + math.log(3.0 / 22.0) + math.log(2.0 / 22.0)
    assert(out._1 === "spam")
    // DECIMAL(20,12) per-term quantization: agree to ~5e-12 per term
    assert(math.abs(out._2 - expected) < 1e-9, s"${out._2} vs $expected")
  }

  test("priors favor the majority class on uninformative text") {
    // token "zzz" appears once in each class → likelihoods tie; the
    // 3:2 ham prior must decide. Build a variant corpus:
    val d2 = Seq(
      (1L, "spam", "zzz"), (2L, "spam", "cheap pills"),
      (3L, "ham", "zzz"), (4L, "ham", "meeting notes"),
      (5L, "ham", "team lunch")
    ).toDF("doc_id", "label", "text")
    val out = NaiveBayes.classify(d2, "doc_id", "label", "text")
      .filter($"doc_id" === 1L).select("pred").as[String].head()
    assert(out === "ham") // prior ln(3/5) > ln(2/5); same likelihood
  }

  test("empty-token documents are absent; token counts are right") {
    val d3 = Seq(
      (1L, "a", "x y"), (2L, "a", "   "), (3L, "b", "x z z")
    ).toDF("doc_id", "label", "text")
    val out = NaiveBayes.classify(d3, "doc_id", "label", "text")
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(!out.contains(2L)) // whitespace-only → no tokens → no row
    assert(out(1L) === 2L && out(3L) === 3L)
  }
}
