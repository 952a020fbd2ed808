package graft.similarity

import graft.SparkSpec

/** Centroids: fixed-point exactness and the k-means step contract. */
class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f), 0),
    (2L, Array(3.0f, 4.0f), 0),
    (3L, Array(10.0f, 20.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("dimSumsFixedPoint: exact scaled sums per (group, dim)") {
    val out = Centroids.dimSumsFixedPoint(vecs, "label", "embedding")
      .orderBy("label", "pos")
      .select("label", "pos", "dim_sum_fp", "n")
      .as[(Int, Int, Long, Long)].collect()
    val s = 1L << 48
    assert(out === Array(
      (0, 0, 4 * s, 2L), (0, 1, 6 * s, 2L),
      (1, 0, 10 * s, 1L), (1, 1, 20 * s, 1L)))
  }

  test("dimSumsFixedPoint is exact for sub-decimal floats") {
    // 0.1f is not exactly 0.1; the fixed-point sum must reproduce the
    // float's true binary value, not its decimal rendering
    val v = Seq((1L, Array(0.1f), 0)).toDF("vec_id", "embedding", "label")
    val got = Centroids.dimSumsFixedPoint(v, "label", "embedding")
      .select("dim_sum_fp").as[Long].head()
    val expected = (0.1f.toDouble * (1L << 48)).toLong
    assert(got === expected)
    assert(got !== (0.1 * (1L << 48)).toLong) // differs from double 0.1
  }

  test("meanCentroids packs per-dim means in dimension order") {
    val out = Centroids.meanCentroids(vecs, "label", "embedding")
      .orderBy("label")
      .select("label", "centroid").as[(Int, Array[Float])].collect()
    assert(out(0)._2.toSeq === Seq(2.0f, 3.0f))
    assert(out(1)._2.toSeq === Seq(10.0f, 20.0f))
  }

  test("kmeansStep reassigns and recomputes (one Lloyd iteration)") {
    // two tight clusters; seed centroids slightly off
    val pts = Seq(
      (1L, Array(0.9f, 0.1f)), (2L, Array(1.1f, 0.1f)),
      (3L, Array(0.1f, 0.9f)), (4L, Array(0.1f, 1.1f)))
      .toDF("vec_id", "embedding")
    val seeds = Seq((10L, Array(1.0f, 0.3f)), (20L, Array(0.3f, 1.0f)))
      .toDF("vec_id", "embedding")
    val next = Centroids
      .kmeansStep(pts, seeds, "vec_id", "embedding", "vec_id")
      .orderBy("vec_id")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    assert(next.map(_._1).toSeq === Seq(10L, 20L))
    // cluster means: (1.0, 0.1) and (0.1, 1.0)
    assert(math.abs(next(0)._2(0) - 1.0f) < 1e-6)
    assert(math.abs(next(0)._2(1) - 0.1f) < 1e-6)
    assert(math.abs(next(1)._2(0) - 0.1f) < 1e-6)
    assert(math.abs(next(1)._2(1) - 1.0f) < 1e-6)
  }
}
