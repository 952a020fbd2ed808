package graft.operators

import graft.SparkSpec

class InfoTheorySpec extends SparkSpec {
  import spark.implicits._

  test("mutualInfo of exactly independent uniform columns is exactly 0") {
    // balanced 2x2 grid: every cell ratio cxy*n/(cx*cy) = 1, ln 1 = 0,
    // floor(0) = 0 — MI is 0 with no quantization residue at all
    val df = (0 until 400).map(i => (i % 2, (i / 2) % 2)).toDF("x", "y")
    val r = InfoTheory.mutualInfo(df, "x", "y")
      .select("n", "n_cells", "h_x", "h_y", "mi", "nmi")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 === 400L && r._2 === 4L)
    assert(math.abs(r._3 - math.log(2.0)) < 1e-5)
    assert(r._5 === 0.0 && r._6 === 0.0)
  }

  test("mutualInfo of a determined column equals its entropy (nmi 1)") {
    val df = (0 until 300).map(i => (i % 3, i % 3)).toDF("x", "y")
    val r = InfoTheory.mutualInfo(df, "x", "y")
      .select("h_x", "mi", "nmi").as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - math.log(3.0)) < 1e-5)
    assert(math.abs(r._2 - r._1) < 1e-5) // MI = H(X) when y = x
    assert(math.abs(r._3 - 1.0) < 1e-5)
  }

  test("mutualInfo drops null-complete rows") {
    val df = Seq((Some(1), Some(1)), (Some(1), None), (None, Some(2)),
      (Some(2), Some(2))).toDF("x", "y")
    val n = InfoTheory.mutualInfo(df, "x", "y")
      .select("n").as[Long].head()
    assert(n === 2L)
  }

  test("diversity: a single species is pure concentration") {
    val df = Seq(("s", "en"), ("s", "en"), ("s", "en")).toDF("k", "sp")
    val r = InfoTheory.diversityByKey(df, "k", "sp")
      .select("n", "richness", "simpson", "gini_simpson", "shannon")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 === 3L && r._2 === 1L)
    assert(r._3 === 1.0 && r._4 === 0.0)
    assert(math.abs(r._5) < 2e-6) // micro-nat floor residue only
  }

  test("diversity: k uniform species approach ln k and (k-1)/k") {
    val df = (0 until 500).map(i => ("s", s"sp${i % 5}")).toDF("k", "sp")
    val r = InfoTheory.diversityByKey(df, "k", "sp")
      .select("richness", "simpson", "shannon", "eff_species")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 === 5L)
    // without-replacement Simpson: (k*m*(m-1)) / (n*(n-1)), m = 100
    assert(math.abs(r._2 - 5.0 * 100.0 * 99.0 / (500.0 * 499.0)) < 1e-12)
    assert(math.abs(r._3 - math.log(5.0)) < 1e-5)
    assert(math.abs(r._4 - 5.0) < 1e-4)
  }

  test("results are invariant under repartitioning") {
    val df = (0 until 600).map(i => (i % 4, i % 6)).toDF("x", "y")
    val a = InfoTheory.mutualInfo(df, "x", "y")
      .select("mi", "nmi").as[(Double, Double)].head()
    val b = InfoTheory.mutualInfo(df.repartition(7), "x", "y")
      .select("mi", "nmi").as[(Double, Double)].head()
    assert(a === b)
  }
}
