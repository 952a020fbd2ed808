package graft.operators

import graft.SparkSpec

class JoinEstimateSpec extends SparkSpec {
  import spark.implicits._

  test("sampling the whole universe recovers the exact join size") {
    val a = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k1")
    val b = Seq(1L, 2L, 2L, 4L).toDF("k2")
    // true join size: 1→2·1 + 2→1·2 = 4
    val est = JoinEstimate.equiJoinRows(a, "k1", b, "k2",
      buckets = 10, sampledBuckets = 10)
      .as[Long].head()
    assert(est === 4L)
  }

  test("partial sample scales the sampled mass by the exact factor") {
    val a = (0L until 400L).toDF("k1")              // one row per key
    val b = (0L until 400L).flatMap(k => Seq(k, k)).toDF("k2") // two each
    // true size 800; the deterministic 1/4 key range must scale back ×4
    val est = JoinEstimate.equiJoinRows(a, "k1", b, "k2",
      buckets = 4, sampledBuckets = 1).as[Long].head()
    // unbiased and deterministic: recompute == same value, near truth
    val est2 = JoinEstimate.equiJoinRows(a, "k1", b, "k2",
      buckets = 4, sampledBuckets = 1).as[Long].head()
    assert(est === est2)
    assert(est % 8L === 0L)   // ×4 scale of a 2-per-key mass
    assert(est > 400L && est < 1200L, s"est=$est should be near 800")
  }

  test("disjoint key spaces estimate zero; invalid bucket split rejected") {
    val a = Seq(1L, 2L).toDF("k1")
    val b = Seq(3L, 4L).toDF("k2")
    assert(JoinEstimate.equiJoinRows(a, "k1", b, "k2", 10, 10)
      .as[Long].head() === 0L)
    intercept[IllegalArgumentException] {
      JoinEstimate.equiJoinRows(a, "k1", b, "k2", 10, 3)
    }
  }
}
