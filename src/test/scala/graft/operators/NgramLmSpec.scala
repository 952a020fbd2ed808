package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the rug"),
    (3L, "the dog sat on the mat"),
    (4L, "mat the on sat cat the") // same unigrams as 1, garbled order
  ).toDF("doc_id", "text")

  test("model counts interior bigrams") {
    val m = NgramLm.model(corpus.filter($"doc_id" === 1L), "text")
      .as[(String, String, Long)].collect().toSet
    assert(m == Set(("the", "cat", 1L), ("cat", "sat", 1L),
      ("sat", "on", 1L), ("on", "the", 1L), ("the", "mat", 1L)))
  }

  test("garbled token order scores below fluent text despite identical unigrams") {
    val s = NgramLm.selfScore(corpus, "doc_id", "text")
      .select($"doc_id", $"avg_logprob").as[(Long, Double)]
      .collect().toMap
    // doc 4 has the same words as doc 1 but transitions the corpus never
    // repeats — unigram rarity is blind to this, the bigram LM is not
    assert(s(4L) < s(1L) && s(4L) < s(2L) && s(4L) < s(3L))
  }

  test("documents with fewer than two tokens are absent") {
    val d = Seq((1L, "solo"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val s = NgramLm.selfScore(d, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSeq
    assert(s == Seq(3L))
  }

  test("NULL text neither scores nor poisons the model") {
    val d = Seq((1L, Option("a b a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    // "a b a b" bigrams: (a,b) x2 and (b,a) x1 -> two model rows
    val m = NgramLm.model(d, "text").as[(String, String, Long)].collect().toSet
    assert(m == Set(("a", "b", 2L), ("b", "a", 1L)))
    val s = NgramLm.selfScore(d, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSeq
    assert(s == Seq(1L))
  }

  test("an empty model yields NULL avg_logprob, not an Infinity artifact") {
    val noModel = NgramLm.model(Seq((1L, "solo")).toDF("doc_id", "text"), "text")
    val probe = Seq((9L, "two tokens here")).toDF("doc_id", "text")
    val s = NgramLm.score(probe, "doc_id", "text", noModel)
      .select($"n_bigrams", $"avg_logprob").as[(Long, Option[Double])].head()
    assert(s._1 == 2L && s._2.isEmpty)
  }

  test("scoring against a foreign model floors unseen bigrams at add-k") {
    val model = NgramLm.model(corpus, "text")
    val probe = Seq((9L, "zzz qqq")).toDF("doc_id", "text")
    val s = NgramLm.score(probe, "doc_id", "text", model)
      .select($"n_bigrams", $"avg_logprob").as[(Long, Double)].head()
    // c12=0, c1=0 -> ln(k / (k*V)) = -ln(V)
    val v = model.select($"w2").distinct().count()
    assert(s._1 == 1L && math.abs(s._2 - (-math.log(v.toDouble))) < 1e-9)
  }

  test("per-document mean is the mean of its bigram log-probs") {
    val one = Seq((1L, "the cat")).toDF("doc_id", "text")
    val m = NgramLm.model(corpus, "text")
    val s = NgramLm.score(one, "doc_id", "text", m, addK = 0.5)
      .select($"avg_logprob").as[Double].head()
    // c(the,cat)=2, c(the,*)=2+2+2+1+1=8? count contexts from corpus:
    // "the" precedes: cat(2), dog(1), mat(2), rug(1), on->the... compute:
    // docs 1-3 give the->cat x2, the->dog x1, the->mat x2, the->rug x1;
    // doc 4 gives the->on x1  => c1(the)=7; V = distinct successors
    val v = NgramLm.model(corpus, "text").select($"w2").distinct().count()
    val expect = math.log((2.0 + 0.5) / (7.0 + 0.5 * v.toDouble))
    assert(math.abs(s - expect) < 1e-9)
  }
}
