package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("a symmetric 2-cycle is a fixed point at rank 1.0") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("s", "d")
    val r = PageRank.run(e, "s", "d", iters = 5)
      .as[(String, Double)].collect().toMap
    assert(r("a") == 1.0 && r("b") == 1.0)
  }

  test("two hand-computed iterations on a 3-node graph") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val r = PageRank.run(e, "s", "d", iters = 2)
      .as[(String, Double)].collect().toMap
    // r1 = (A 1.0, B 0.575, C 1.425); r2 below
    assert(math.abs(r("a") - 1.36125) < 1e-6) // contributions are float-quantized
    assert(math.abs(r("b") - 0.575) < 1e-6) // contributions are float-quantized
    assert(math.abs(r("c") - 1.06375) < 1e-6) // contributions are float-quantized
  }

  test("without dangling nodes total mass is conserved") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (3L, 1L))
      .toDF("s", "d")
    val sum = PageRank.run(e, "s", "d", iters = 4)
      .agg(org.apache.spark.sql.functions.sum($"rank")).as[Double].head()
    assert(math.abs(sum - 4.0) < 1e-5) // float-quantized contributions
  }

  test("a dangling sink leaks mass and keeps the floor rank as a source") {
    val e = Seq(("a", "b")).toDF("s", "d")
    val r = PageRank.run(e, "s", "d", iters = 1)
      .as[(String, Double)].collect().toMap
    // b received a's whole unit; a keeps the (1-d) floor — compared with
    // tolerance, 1.0 - 0.85 is not 0.15 in IEEE
    assert(math.abs(r("a") - 0.15) < 1e-9 && r("b") == 1.0)
  }

  test("iters = 0 returns the uniform start") {
    val e = Seq(("a", "b")).toDF("s", "d")
    val r = PageRank.run(e, "s", "d", iters = 0)
      .as[(String, Double)].collect().toMap
    assert(r == Map("a" -> 1.0, "b" -> 1.0))
  }

  test("convergence stop yields ranks within tolerance of the full run") {
    // ring + chord graph converges fast; a tight budget of 20 rounds with
    // tolerance 1e-6 must stop early yet agree with the full 20-round run
    // to within the declared L1 tolerance per node
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (3L, 1L))
      .toDF("s", "d")
    val full = PageRank.run(e, "s", "d", iters = 20)
      .as[(Long, Double)].collect().toMap
    val early = PageRank.runConverged(e, "s", "d", maxIters = 20,
      tolerance = 1e-6).as[(Long, Double)].collect().toMap
    assert(early.keySet == full.keySet)
    // the stop fires when the per-round L1 delta < 1e-6; from there the
    // damped iteration is a 0.85-contraction, so the distance to the
    // fixed point (and hence to any later iterate) is < tol/(1-d)
    early.foreach { case (n, r) =>
      assert(math.abs(r - full(n)) < 1e-6 / (1.0 - 0.85),
        s"node $n: early=$r full=${full(n)}")
    }
  }

  test("convergence stop on a fixed-point graph stops after one round") {
    // symmetric 2-cycle is AT the fixed point: round 1's delta is 0, so
    // the loop must not pay rounds 2..maxIters (behaviorally observable:
    // ranks stay exactly 1.0 and the call returns quickly even with a
    // large budget)
    val e = Seq(("a", "b"), ("b", "a")).toDF("s", "d")
    val r = PageRank.runConverged(e, "s", "d", maxIters = 50,
      tolerance = 1e-12).as[(String, Double)].collect().toMap
    assert(r("a") == 1.0 && r("b") == 1.0)
  }

  test("the center of an in-star outranks the spokes") {
    val e = (1L to 9L).map(i => (i, 0L)).toDF("s", "d")
    val r = PageRank.run(e, "s", "d", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert((1L to 9L).forall(i => r(0L) > r(i)))
  }
}
