package graft.similarity

import graft.SparkSpec

class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.8f, 0.2f), 0),
    (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.2f, 0.8f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("queries classify to the nearer class centroid") {
    val probes = Seq((10L, Array(0.9f, 0.1f), -1),
      (11L, Array(0.1f, 0.9f), -1))
      .toDF("vec_id", "embedding", "label")
    val out = NearestCentroid.predict(corpus, probes,
      "vec_id", "embedding", "label")
      .select("query_id", "pred_label")
      .as[(Long, Int)].collect().toMap
    assert(out(10L) === 0 && out(11L) === 1)
  }

  test("cosine against the sum vector matches the mean-centroid value") {
    // cos(q, sum) == cos(q, mean) — scale invariance, hand-checked
    val probes = Seq((10L, Array(1.0f, 0.0f), -1))
      .toDF("vec_id", "embedding", "label")
    val sim = NearestCentroid.predict(corpus, probes,
      "vec_id", "embedding", "label")
      .select("cos_sim").as[Double].head()
    // class-0 sum = (1.8, 0.2): cos = 1.8/sqrt(1.8²+0.2²); agreement
    // bounded by float32 element precision + the 1e-6 norm quantum
    val expect = 1.8 / math.sqrt(1.8 * 1.8 + 0.2 * 0.2)
    assert(math.abs(sim - expect) < 1e-6, s"$sim vs $expect")
  }

  test("equidistant ties break toward the smaller label") {
    val sym = Seq((1L, Array(1.0f, 0.0f), 5), (2L, Array(0.0f, 1.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val probe = Seq((9L, Array(1.0f, 1.0f), -1))
      .toDF("vec_id", "embedding", "label")
    val out = NearestCentroid.predict(sym, probe,
      "vec_id", "embedding", "label")
      .select("pred_label").as[Int].head()
    assert(out === 3)
  }
}
