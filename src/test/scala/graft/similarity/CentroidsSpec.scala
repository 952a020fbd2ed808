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

  test("kmeansInit is a deterministic partitioning-independent sample") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def init(df: org.apache.spark.sql.DataFrame) = Centroids
      .kmeansInit(df, "vec_id", "embedding", k = 8, seed = 7L)
      .select("centroid_id").as[Long].collect().toSeq
    val a = init(e)
    val b = init(e.repartition(13))
    assert(a == (0L until 8L) && b == (0L until 8L))
    // same vectors picked regardless of layout
    def vecsOf(df: org.apache.spark.sql.DataFrame) = Centroids
      .kmeansInit(df, "vec_id", "embedding", k = 8, seed = 7L)
      .select("embedding").as[Array[Float]].collect().map(_.toSeq).toSet
    assert(vecsOf(e) == vecsOf(e.repartition(13)))
  }

  test("kmeans objective is non-decreasing over Lloyd rounds") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def obj(iters: Int): Double = Centroids.objective(
      e, Centroids.kmeans(e, "vec_id", "embedding", k = 8, iters = iters,
        seed = 7L),
      "vec_id", "embedding", "centroid_id")
    val o0 = obj(0)
    val o2 = obj(2)
    val o4 = obj(4)
    info(f"spherical objective: init $o0%.4f, 2 rounds $o2%.4f, 4 rounds $o4%.4f")
    assert(o2 >= o0 - 1e-9 && o4 >= o2 - 1e-9,
      s"Lloyd objective regressed: $o0 -> $o2 -> $o4")
    assert(o4 > o0, "training never improved the objective")
  }

  test("kmeans separates obvious clusters") {
    // three tight angular clusters; training from hash-seeded init must
    // end with every cluster's members assigned together
    def at(deg: Double, r: Float) = Array(
      (math.cos(math.toRadians(deg)) * r).toFloat,
      (math.sin(math.toRadians(deg)) * r).toFloat)
    val pts = (0 until 30).map { i =>
      val base = (i % 3) * 120.0
      (i.toLong, at(base + (i / 3) % 5 - 2, 1.0f + (i % 7) * 0.1f))
    }.toDF("vec_id", "embedding")
    val cents = Centroids.kmeans(pts, "vec_id", "embedding",
      k = 3, iters = 6, seed = 1L)
    val assigned = graft.similarity.CosineSearch.ivfAssign(
        pts, cents, "vec_id", "embedding", "centroid_id")
      .select("vec_id", "centroid_id").as[(Long, Long)].collect()
    val groups = assigned.groupBy(_._1 % 3).values
      .map(_.map(_._2).toSet).toSeq
    // each angular cluster maps to exactly one centroid, all distinct
    assert(groups.forall(_.size == 1), s"cluster split across centroids: $groups")
    assert(groups.flatten.toSet.size == 3, s"centroids collapsed: $groups")
  }
}
