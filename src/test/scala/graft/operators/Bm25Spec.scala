package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat and the cat again"), // tf(cat)=2, shortest match wins on tf
    (3L, "a dog barks at a dog park near the dog pound all day long"),
    (4L, "nothing relevant here at all")
  ).toDF("doc_id", "text")

  test("only matching documents appear, ranked by score") {
    val r = Bm25.search(docs, "doc_id", "text", Seq("cat", "dog"), topK = 10)
      .select($"doc_id", $"n_terms").as[(Long, Long)].collect().toSeq
    // doc 4 matches nothing; docs 1-3 match exactly one term each
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L) && r.forall(_._2 == 1L))
  }

  test("higher tf at comparable length ranks higher") {
    val r = Bm25.search(docs, "doc_id", "text", Seq("cat"), topK = 10)
      .select($"doc_id").as[Long].collect().toSeq
    assert(r == Seq(2L, 1L)) // two cats beat one at similar dl
  }

  test("matching more query terms outranks matching one") {
    val d = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha delta epsilon")
    ).toDF("doc_id", "text")
    val r = Bm25.search(d, "doc_id", "text", Seq("alpha", "beta"), topK = 10)
      .select($"doc_id", $"n_terms").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L), (2L, 1L)))
  }

  test("topK truncates after the full ranking") {
    val r = Bm25.search(docs, "doc_id", "text", Seq("cat", "dog"), topK = 1)
      .select($"doc_id").as[Long].collect().toSeq
    assert(r.size == 1)
  }

  test("searchMany with a single query equals search") {
    val q = Seq(("q1", "cat"), ("q1", "dog")).toDF("qid", "term")
    val many = Bm25.searchMany(docs, "doc_id", "text", q, "qid", "term",
        topK = 10)
      .select($"rank", $"doc_id", $"n_terms", $"sum_tf", $"score")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq.sorted
    val one = Bm25.search(docs, "doc_id", "text", Seq("cat", "dog"),
        topK = 10)
      .as[(Int, Long, Long, Long, Double)].collect().toSeq.sorted
    assert(many == one)
  }

  test("searchMany keeps queries independent") {
    val q = Seq(("q1", "cat"), ("q2", "dog")).toDF("qid", "term")
    val r = Bm25.searchMany(docs, "doc_id", "text", q, "qid", "term",
        topK = 10)
      .select($"query_id", $"doc_id").as[(String, Long)].collect().toSet
    // cat matches docs 1-2 only, dog matches doc 3 only
    assert(r == Set(("q1", 1L), ("q1", 2L), ("q2", 3L)))
  }

  test("searchMany dedups repeated (query, term) rows") {
    val qDup = Seq(("q1", "cat"), ("q1", "cat"), ("q1", "dog"))
      .toDF("qid", "term")
    val q = Seq(("q1", "cat"), ("q1", "dog")).toDF("qid", "term")
    val run = (d: org.apache.spark.sql.DataFrame) =>
      Bm25.searchMany(docs, "doc_id", "text", d, "qid", "term", topK = 10)
        .select($"rank", $"doc_id", $"n_terms", $"sum_tf", $"score")
        .as[(Int, Long, Long, Long, Double)].collect().toSeq.sorted
    assert(run(qDup) == run(q))
  }

  test("idf is the always-positive Lucene form") {
    // a term in EVERY doc still scores > 0 (classic idf would be ln(1)=0
    // or negative for df > N/2)
    val d = Seq((1L, "common word"), (2L, "common thing")).toDF("doc_id", "text")
    val r = Bm25.search(d, "doc_id", "text", Seq("common"), topK = 10)
      .select($"score").as[Double].collect().toSeq
    assert(r.size == 2 && r.forall(_ > 0.0))
  }
}
