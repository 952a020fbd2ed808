package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def toDf(vs: Seq[Array[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding")

  test("jacobiEigen matches the closed form on a 2x2") {
    val (evals, evecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = evals.zipWithIndex.sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-12)
    assert(math.abs(pairs(1)._1 - 1.0) < 1e-12)
    // top eigenvector is (1,1)/sqrt(2) up to sign
    val top = Array(evecs(0)(pairs(0)._2), evecs(1)(pairs(0)._2))
    assert(math.abs(math.abs(top(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(top(0) - top(1)) < 1e-12)
  }

  test("rank-2 data in 4 dims: two components explain everything") {
    val rnd = new scala.util.Random(3)
    // plane spanned by u=(1,1,0,0)/sqrt2, w=(0,0,1,-1)/sqrt2, shifted
    val vs = (1 to 200).map { _ =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian()
      Array((5 + a).toFloat, (5 + a).toFloat, (1 + b).toFloat,
        (1 - b).toFloat)
    }
    val m = Pca.fit(toDf(vs), "embedding", dim = 4, k = 3)
    val ratios = m.explainedRatio
    assert(ratios(0) + ratios(1) > 0.999999,
      s"top-2 must explain all variance, got ${ratios.toSeq}")
    assert(m.eigenvalues(0) > m.eigenvalues(1),
      "eigenvalues must be descending")
    assert(math.abs(m.eigenvalues(2)) < 1e-6)
    // components orthonormal
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = m.components(i).zip(m.components(j))
        .map { case (x, y) => x * y }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<c$i,c$j> = $dot")
    }
    // sampling correlation between a and b tilts the top eigenvector
    // WITHIN the u-w plane (~cov/Δλ ≈ 2% here), so pin the exact
    // invariant instead: components lie in the data plane — orthogonal
    // to the exact null directions (1,-1,0,0) and (0,0,1,1) — and the
    // top one is u-dominated
    for (ci <- 0 until 2) {
      val c0 = m.components(ci)
      assert(math.abs(c0(0) - c0(1)) < 1e-5, s"c$ci not in plane (u-null)")
      assert(math.abs(c0(2) + c0(3)) < 1e-5, s"c$ci not in plane (w-null)")
    }
    assert(math.abs(m.components(0)(0)) > 0.65,
      "top component must be u-dominated (variance 9 vs 1)")
  }

  test("projection preserves centered geometry (distances in the plane)") {
    val rnd = new scala.util.Random(9)
    val vs = (1 to 100).map { _ =>
      val a = rnd.nextGaussian() * 2.0
      val b = rnd.nextGaussian()
      Array((a + b).toFloat, (a - b).toFloat, (2 * a).toFloat)
    }
    val df = toDf(vs)
    val m = Pca.fit(df, "embedding", dim = 3, k = 2)
    val proj = Pca.project(df, "embedding", m)
      .select("id", "pc0", "pc1").as[(Long, Double, Double)]
      .collect().sortBy(_._1)
    // rank-2 input: pairwise distances survive the k=2 projection
    val raw = vs.map(_.map(_.toDouble))
    for (i <- 0 until 20; j <- (i + 1) until 20) {
      val dRaw = math.sqrt(raw(i).zip(raw(j))
        .map { case (x, y) => (x - y) * (x - y) }.sum)
      val dP = math.sqrt(
        math.pow(proj(i)._2 - proj(j)._2, 2) +
          math.pow(proj(i)._3 - proj(j)._3, 2))
      assert(math.abs(dRaw - dP) < 1e-4, s"pair ($i,$j): $dRaw vs $dP")
    }
  }

  test("translation invariance: shifting every vector changes only the mean") {
    val rnd = new scala.util.Random(5)
    val vs = (1 to 150).map(_ =>
      Array.fill(5)((rnd.nextGaussian() * (rnd.nextInt(3) + 1)).toFloat))
    val shifted = vs.map(v => v.zipWithIndex.map { case (x, i) =>
      (x + 10f * (i + 1)) })
    val m1 = Pca.fit(toDf(vs), "embedding", 5, 3)
    val m2 = Pca.fit(toDf(shifted), "embedding", 5, 3)
    m1.components.zip(m2.components).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
    m1.eigenvalues.zip(m2.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6)
    }
  }

  test("null and wrong-width vectors are skipped, not crashed on") {
    val df = Seq(
      (1L, Array(1f, 2f)), (2L, Array(3f, 4f)), (3L, null),
      (4L, Array(1f, 2f, 3f)), (5L, Array(5f, 6f))
    ).toDF("id", "embedding")
    val m = Pca.fit(df, "embedding", dim = 2, k = 1)
    assert(m.mean.length === 2)
    assert(m.totalVariance > 0.0)
  }

  test("works on the sf0.001 embeddings table end to end") {
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val m = Pca.fit(df, "embedding", dim = 64, k = 8)
    assert(m.explainedRatio.forall(r => r >= 0.0 && r <= 1.0))
    assert(m.eigenvalues.toSeq === m.eigenvalues.sortBy(-_).toSeq)
    val proj = Pca.project(df, "embedding", m)
    assert(proj.columns.count(_.startsWith("pc")) === 8)
    // projected variance along pc0 equals the top eigenvalue
    val n = proj.count().toDouble
    val v0 = proj.agg(sum(col("pc0") * col("pc0")), sum(col("pc0")))
      .as[(Double, Double)].head()
    val varPc0 = v0._1 / n - math.pow(v0._2 / n, 2)
    assert(math.abs(varPc0 - m.eigenvalues(0)) / m.eigenvalues(0) < 1e-6)
  }
}
