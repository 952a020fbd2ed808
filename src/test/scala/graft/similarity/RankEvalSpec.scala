package graft.similarity

import graft.SparkSpec

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (String, Long, Int)*) =
    rows.toSeq.toDF("q", "id", "rank")

  test("recall@k counts top-k intersection per query") {
    val cand = ranking(("q1", 1L, 1), ("q1", 2L, 2), ("q1", 9L, 3),
      ("q2", 5L, 1), ("q2", 6L, 2), ("q2", 7L, 3))
    val ref = ranking(("q1", 1L, 1), ("q1", 3L, 2), ("q1", 2L, 3),
      ("q2", 8L, 1), ("q2", 9L, 2), ("q2", 10L, 3))
    val out = RankEval.recallAtK(cand, ref, "q", "id", "rank", 3)
      .as[(String, Double)].collect().toMap
    assert(out("q1") == 2.0 / 3.0)
    assert(out("q2") == 0.0)
  }

  test("ranks beyond k are invisible on both sides") {
    val cand = ranking(("q", 1L, 1), ("q", 2L, 5))
    val ref = ranking(("q", 2L, 1), ("q", 1L, 9))
    val out = RankEval.recallAtK(cand, ref, "q", "id", "rank", 2)
      .as[(String, Double)].collect().toMap
    // cand top-2 = {1}; ref top-2 = {2}: no overlap
    assert(out("q") == 0.0)
  }

  test("queries missing from the reference score 0, not NaN") {
    val cand = ranking(("only_cand", 1L, 1))
    val ref = ranking(("other", 1L, 1))
    val out = RankEval.recallAtK(cand, ref, "q", "id", "rank", 1)
      .as[(String, Double)].collect().toMap
    assert(out == Map("only_cand" -> 0.0))
  }

  test("IVF retrieval evaluates against brute force with high recall") {
    // Two well-separated clusters of deterministic vectors: IVF with
    // one centroid per cluster must retrieve essentially what brute
    // force does.
    def vec(cluster: Int, i: Int): Array[Float] = {
      val base = Array.fill(8)(if (cluster == 0) 1.0f else -1.0f)
      base(i % 8) += 0.05f * ((i % 7) + 1)
      base
    }
    val vecs = (0 until 40).map(i => (i.toLong, vec(i % 2, i)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 6)
    val cents = vecs.filter($"vec_id" < 2) // one per cluster
    val brute = CosineSearch.bruteForceTopK(vecs, queries,
      "vec_id", "embedding", 5)
    val ivf = CosineSearch.ivfTopK(vecs, cents, queries,
      "vec_id", "embedding", "vec_id", 5)
    val rec = RankEval.recallAtK(ivf, brute,
      "query_id", "nn_id", "rank", 5)
      .as[(Long, Double)].collect()
    assert(rec.length == 6)
    assert(rec.forall(_._2 >= 0.8), s"low IVF recall: ${rec.mkString(",")}")
  }

  private def ndcg(ranking: Seq[(String, String, Int)],
      rel: Seq[(String, String, Long)], k: Int) =
    RankEval.ndcgAtK(ranking.toDF("q", "id", "rank"),
      rel.toDF("q", "id", "rel"), "q", "id", "rank", "rel", k)
      .select("q", "dcg", "idcg", "ndcg")
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap

  test("ndcg: hand-computed graded case with an unretrieved relevant id") {
    val w = RankEval.ndcgWeights(3)
    val out = ndcg(
      Seq(("q", "a", 1), ("q", "b", 2), ("q", "c", 3)),
      Seq(("q", "a", 3L), ("q", "c", 1L), ("q", "d", 2L)), 3)
    // DCG = 3*w1 + 0*w2 + 1*w3; ideal order a(3), d(2), c(1)
    val dcg = 3.0 * w(0) + 0.0 * w(1) + 1.0 * w(2)
    val idcg = 3.0 * w(0) + 2.0 * w(1) + 1.0 * w(2)
    assert(out("q") == (("q", Some(dcg), Some(idcg), Some(dcg / idcg))))
  }

  test("ndcg: the ideal ranking scores exactly 1.0") {
    val out = ndcg(
      Seq(("q", "a", 1), ("q", "d", 2), ("q", "c", 3)),
      Seq(("q", "a", 3L), ("q", "c", 1L), ("q", "d", 2L)), 3)
    assert(out("q")._4.contains(1.0))
  }

  test("ndcg: no relevant ids gives null, not zero-division") {
    val out = ndcg(
      Seq(("q", "a", 1)), Seq(("q", "a", 0L)), 3)
    assert(out("q")._4.isEmpty)
  }

  test("ndcg: queries only in the relevance table are not evaluated") {
    val out = ndcg(
      Seq(("q", "a", 1)), Seq(("q", "a", 1L), ("z", "x", 5L)), 2)
    assert(out.keySet == Set("q"))
    assert(out("q")._4.contains(1.0))
  }

  test("ndcg: relevance beyond rank k does not leak into DCG") {
    // b is highly relevant but ranked 3 > k=2: DCG sees only a.
    val w = RankEval.ndcgWeights(2)
    val out = ndcg(
      Seq(("q", "a", 1), ("q", "x", 2), ("q", "b", 3)),
      Seq(("q", "a", 1L), ("q", "b", 5L)), 2)
    val dcg = 1.0 * w(0) + 0.0 * w(1)
    val idcg = 5.0 * w(0) + 1.0 * w(1)
    assert(out("q") == (("q", Some(dcg), Some(idcg), Some(dcg / idcg))))
  }

  private def ap(ranking: Seq[(String, String, Int)],
      rel: Seq[(String, String, Long)], k: Int) =
    RankEval.averagePrecisionAtK(ranking.toDF("q", "id", "rank"),
      rel.toDF("q", "id", "rel"), "q", "id", "rank", "rel", k)
      .as[(String, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap

  test("ap: hand-computed micro terms with an unretrieved relevant id") {
    // hits at ranks 1 and 3; d relevant but unretrieved (R=3):
    // terms 1e6*1//1 + 1e6*2//3 = 1000000 + 666666 = 1666666
    // ap_ppm = 1666666 // min(3,3) = 555555
    val out = ap(
      Seq(("q", "a", 1), ("q", "b", 2), ("q", "c", 3)),
      Seq(("q", "a", 1L), ("q", "c", 2L), ("q", "d", 1L)), 3)
    assert(out("q") === (("q", 3L, 2L, 1666666L, Some(555555L))))
  }

  test("ap: perfect top-k retrieval of all relevant ids is 1.0 (ppm)") {
    val out = ap(
      Seq(("q", "a", 1), ("q", "b", 2)),
      Seq(("q", "a", 1L), ("q", "b", 7L)), 2)
    // terms 1e6 + 1e6 = 2e6; ap_ppm = 2e6 // 2 = 1e6
    assert(out("q") === (("q", 2L, 2L, 2000000L, Some(1000000L))))
  }

  test("ap: no relevant ids gives null ap, zero r_total") {
    val out = ap(Seq(("q", "a", 1)), Seq(("q", "z", 0L)), 2)
    assert(out("q") === (("q", 0L, 0L, 0L, None)))
  }

  test("ap: R beyond k normalizes by k, not R") {
    // 3 relevant, k=2, both retrieved slots hit:
    // terms 1e6 + 1e6; denom min(3,2)=2 -> 1e6
    val out = ap(
      Seq(("q", "a", 1), ("q", "b", 2), ("q", "c", 3)),
      Seq(("q", "a", 1L), ("q", "b", 1L), ("q", "c", 1L)), 2)
    assert(out("q") === (("q", 3L, 2L, 2000000L, Some(1000000L))))
  }

  test("ap: relevance beyond rank k does not add terms") {
    // c relevant at rank 3 > k=2 -> only the rank-1 hit counts
    val out = ap(
      Seq(("q", "a", 1), ("q", "x", 2), ("q", "c", 3)),
      Seq(("q", "a", 1L), ("q", "c", 1L)), 2)
    // terms: 1e6*1//1; ap_ppm = 1e6 // min(2,2) = 500000
    assert(out("q") === (("q", 2L, 1L, 1000000L, Some(500000L))))
  }
}
