package graft.similarity

import graft.SparkSpec

class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on orthogonal axes + probes near each
  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),
    (3L, Array(0.95f, 0.05f, 0.0f), 0),
    (4L, Array(0.0f, 1.0f, 0.0f), 1),
    (5L, Array(0.1f, 0.9f, 0.0f), 1),
    (6L, Array(0.05f, 0.95f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("probes take their cluster's majority label") {
    val probes = corpus.filter($"vec_id".isin(1L, 4L))
    val out = KnnClassify.predictBruteForce(corpus, probes,
      "vec_id", "embedding", "label", 3)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // probe 1's 3 NN: 2,3 (label 0) and one cross vector → 2 votes label 0
    assert(out(1L)._1 === 0 && out(1L)._2 === 2L)
    assert(out(4L)._1 === 1 && out(4L)._2 === 2L)
  }

  test("vote ties break toward the smallest label") {
    // neighbors table with a 1-1 vote split
    val nn = Seq((10L, 1L), (10L, 4L)).toDF("query_id", "nn_id")
    val out = KnnClassify.vote(nn, corpus, "vec_id", "label")
      .as[(Long, Int, Long)].head()
    assert(out === ((10L, 0, 1L)))
  }

  test("self never votes") {
    val probes = corpus.filter($"vec_id" === 1L)
    val nnIds = CosineSearch.bruteForceTopK(corpus, probes,
      "vec_id", "embedding", 5)
      .select("nn_id").as[Long].collect()
    assert(!nnIds.contains(1L))
  }
}
