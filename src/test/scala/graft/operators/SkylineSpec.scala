package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def frontier(pts: Seq[(Double, Double)], buckets: Int = 4) =
    Skyline.pareto2d(pts.toDF("x", "y"), "x", "y", buckets)
      .as[(Double, Double)].collect().toSet

  /** Reference O(n²) dominance. */
  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filterNot(p => d.exists(q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))).toSet
  }

  test("known frontier") {
    val pts = Seq((1.0, 9.0), (5.0, 5.0), (9.0, 1.0), // frontier
      (1.0, 8.0), (4.0, 5.0), (5.0, 4.0), (2.0, 2.0)) // dominated
    assert(frontier(pts) == Set((1.0, 9.0), (5.0, 5.0), (9.0, 1.0)))
  }

  test("equal-coordinate dominance: same x higher y, same y higher x") {
    assert(frontier(Seq((3.0, 3.0), (3.0, 5.0))) == Set((3.0, 5.0)))
    assert(frontier(Seq((3.0, 3.0), (5.0, 3.0))) == Set((5.0, 3.0)))
  }

  test("duplicate points collapse to one frontier entry") {
    assert(frontier(Seq((3.0, 3.0), (3.0, 3.0))) == Set((3.0, 3.0)))
  }

  test("a single maximal point dominates everything") {
    val pts = (1 to 50).map(i => (i.toDouble, i.toDouble))
    assert(frontier(pts) == Set((50.0, 50.0)))
  }

  test("matches brute force and is bucket-count invariant") {
    // Deterministic pseudo-random spread (no Random: reproducibility).
    val pts = (1 to 300).map { i =>
      ((i * 7919 % 1000).toDouble, (i * 104729 % 1000).toDouble)
    }
    val expect = brute(pts)
    assert(frontier(pts, buckets = 1) == expect)
    assert(frontier(pts, buckets = 7) == expect)
    assert(frontier(pts, buckets = 64) == expect)
  }

  test("null coordinates are excluded") {
    val df = Seq((Some(1.0), Some(1.0)), (None, Some(9.0)), (Some(9.0), None))
      .toDF("x", "y")
    val out = Skyline.pareto2d(df, "x", "y").as[(Double, Double)].collect()
    assert(out.toSeq == Seq((1.0, 1.0)))
  }
}
