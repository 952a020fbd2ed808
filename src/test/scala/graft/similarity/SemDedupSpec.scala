package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDedup — the clustered-dedup composite: verdict shape, the
  * farthest-from-centroid keeper rule, the keepers anti-join, and the
  * nProbe recall knob inherited from the IVF pair path. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal centroids; vectors 1/2 are near-dups on c1, 4/5 on
  // c2, 6 sits between the buckets and matches nothing at 0.99
  private def centroids = Seq(
    (100L, Array(1f, 0f)), (101L, Array(0f, 1f))).toDF("cid", "embedding")
  private def vecs = Seq(
    (1L, Array(1f, 0f)),       // c_sim 1.0   (exactly the centroid)
    (2L, Array(0.9f, 0.1f)),   // c_sim ~.994 -> the cluster's keeper
    (4L, Array(0f, 1f)),
    (5L, Array(0.1f, 0.9f)),
    (6L, Array(0.7f, 0.7f))
  ).toDF("vec_id", "embedding")

  private def verdicts = SemDedup.verdicts(
    vecs, centroids, "vec_id", "embedding", "cid", threshold = 0.99)

  test("verdicts clusters within-bucket near-dups and keeps the farthest") {
    val v = verdicts.orderBy("vec_id")
      .select($"vec_id", $"cluster_id", $"keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    // singletons (vec 6) are absent; cluster id = min member id
    assert(v == Seq(
      (1L, 1L, false), (2L, 1L, true), (4L, 4L, false), (5L, 4L, true)))
  }

  test("the kept member has the cluster's minimum centroid similarity") {
    val rows = verdicts
      .select($"cluster_id", $"centroid_sim", $"keep")
      .as[(Long, Double, Boolean)].collect().toSeq
    rows.groupBy(_._1).foreach { case (_, members) =>
      assert(members.count(_._3) == 1)
      val keptSim = members.find(_._3).get._2
      assert(members.forall(m => keptSim <= m._2))
    }
  }

  test("keepers = unclustered vectors plus one representative per group") {
    val kept = SemDedup.keepers(
        vecs, centroids, "vec_id", "embedding", "cid", threshold = 0.99)
      .select($"vec_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L, 5L, 6L))
  }

  test("keepers preserves the input schema") {
    val kept = SemDedup.keepers(
      vecs, centroids, "vec_id", "embedding", "cid", threshold = 0.99)
    assert(kept.columns.toSeq == vecs.columns.toSeq)
  }

  test("end-to-end with kmeans-trained centroids on real embeddings") {
    // the production composition: train coarse centroids, then semdedup
    // against them — no hand-picked buckets anywhere
    import graft.core.CacheScope
    CacheScope.withScope { scope =>
      val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      val cents = Centroids.kmeans(e, "vec_id", "embedding", k = 8,
        iters = 2, scope = scope)
      val v = SemDedup.verdicts(e, cents, "vec_id", "embedding",
        "centroid_id", threshold = 0.35, scope = scope)
        .select($"vec_id", $"cluster_id", $"keep")
        .as[(Long, Long, Boolean)].collect().toSeq
      assert(v.nonEmpty, "expected duplicate groups at threshold 0.35")
      // exactly one keeper per group, and every group has >= 2 members
      v.groupBy(_._2).foreach { case (cid, members) =>
        assert(members.size >= 2, s"cluster $cid has a lone member")
        assert(members.count(_._3) == 1, s"cluster $cid keeper count != 1")
      }
      // keepers = corpus minus the voted-out members
      val dropped = v.count(!_._3)
      val kept = SemDedup.keepers(e, cents, "vec_id", "embedding",
        "centroid_id", threshold = 0.35, scope = scope).count()
      assert(kept == e.count() - dropped)
    }
  }

  test("nProbe=2 joins a boundary-straddling pair into one group") {
    // g/h hug the 45-degree boundary from opposite sides: near-identical
    // (cos ~.999) but primary-assigned to different centroids
    val straddle = Seq(
      (10L, Array(0.72f, 0.69f)), (11L, Array(0.69f, 0.72f)))
      .toDF("vec_id", "embedding")
    val one = SemDedup.verdicts(straddle, centroids, "vec_id", "embedding",
      "cid", threshold = 0.99, nProbe = 1)
    assert(one.isEmpty)
    val two = SemDedup.verdicts(straddle, centroids, "vec_id", "embedding",
        "cid", threshold = 0.99, nProbe = 2)
      .select($"vec_id", $"cluster_id", $"keep")
      .as[(Long, Long, Boolean)].collect().toSeq.sorted
    assert(two.map(t => (t._1, t._2)) == Seq((10L, 10L), (11L, 10L)))
    assert(two.count(_._3) == 1)
  }
}
