package graft.operators

import graft.SparkSpec

class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- grubbs
  test("grubbs is exact closed-form from the moment profile") {
    // [0,0,0,4]: mean 1, sd 2, G = (4-1)/2 = 1.5, outlier 4
    val df = Seq(0.0, 0.0, 0.0, 4.0).map(("k", _)).toDF("k", "v")
    val r = Diagnostics.grubbsByKey(df, "k", "v")
      .select("n", "g", "outlier_value")
      .as[(Long, Double, Double)].head()
    assert(r === ((4L, 1.5, 4.0)))
  }

  test("grubbs tie between sides resolves to the max side") {
    val df = Seq(-2.0, 0.0, 2.0).map(("k", _)).toDF("k", "v")
    val r = Diagnostics.grubbsByKey(df, "k", "v")
      .select("outlier_value").as[Double].head()
    assert(r === 2.0)
  }

  test("grubbs guards: n < 3 or zero spread give null") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 5.0),
      ("b", 5.0)).toDF("k", "v")
    val rows = Diagnostics.grubbsByKey(df, "k", "v")
      .select("k", "g").collect()
    assert(rows.forall(_.isNullAt(1)))
  }

  // --------------------------------------------------------- bartlett
  test("bartlett is ~0 for equal variances, large for unequal") {
    val equal = Seq(("d", "a", 1.0), ("d", "a", 2.0), ("d", "a", 3.0),
      ("d", "b", 4.0), ("d", "b", 5.0), ("d", "b", 6.0)).toDF("k", "g", "v")
    val k2eq = Diagnostics.bartlettByKey(equal, "k", "g", "v")
      .select("k2").as[Double].head()
    assert(math.abs(k2eq) < 1e-4) // decimal-waypoint residue only
    val unequal = Seq(("d", "a", 1.0), ("d", "a", 1.01), ("d", "a", 0.99),
      ("d", "b", 0.0), ("d", "b", 50.0), ("d", "b", 100.0)).toDF("k", "g", "v")
    val k2un = Diagnostics.bartlettByKey(unequal, "k", "g", "v")
      .select("k2").as[Double].head()
    assert(k2un > 10.0)
  }

  test("bartlett guards: a zero-variance or singleton group nulls K2") {
    val zeroVar = Seq(("d", "a", 1.0), ("d", "a", 1.0),
      ("d", "b", 2.0), ("d", "b", 3.0)).toDF("k", "g", "v")
    assert(Diagnostics.bartlettByKey(zeroVar, "k", "g", "v")
      .select("k2").collect().head.isNullAt(0))
    val singleton = Seq(("d", "a", 1.0),
      ("d", "b", 2.0), ("d", "b", 3.0)).toDF("k", "g", "v")
    assert(Diagnostics.bartlettByKey(singleton, "k", "g", "v")
      .select("k2").collect().head.isNullAt(0))
  }

  // ---------------------------------------------------- durbin-watson
  private def series(vals: Double*) =
    vals.zipWithIndex.map { case (v, t) => ("k", t.toLong, t.toDouble, v) }
      .toDF("k", "t", "x", "y")

  test("alternating residuals push DW toward 4") {
    val df = series((0 until 12).map(t =>
      t.toDouble + (if (t % 2 == 0) 1.0 else -1.0)): _*)
    val dw = Diagnostics.durbinWatsonByKey(df, "k", "t", "x", "y")
      .select("dw").as[Double].head()
    assert(dw > 3.0)
  }

  test("smooth curvature (autocorrelated residuals) pushes DW toward 0") {
    val df = series((0 until 12).map(t => (t * t).toDouble): _*)
    val dw = Diagnostics.durbinWatsonByKey(df, "k", "t", "x", "y")
      .select("dw").as[Double].head()
    assert(dw < 1.0)
  }

  test("the fitted line is the exact decimal-moment OLS") {
    // perfectly linear series: residuals all 0 -> dden = 0 -> dw null
    val df = series((0 until 8).map(t => 2.0 * t + 5.0): _*)
    val row = Diagnostics.durbinWatsonByKey(df, "k", "t", "x", "y")
      .select("b0", "b1", "dw").collect().head
    assert(math.abs(row.getDouble(0) - 5.0) < 1e-9)
    assert(math.abs(row.getDouble(1) - 2.0) < 1e-9)
    assert(row.isNullAt(2))
  }

  test("deterministic under repartitioning") {
    val df = series((0 until 30).map(t =>
      t * 1.5 + (t % 5) * 2.0): _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      Diagnostics.durbinWatsonByKey(d, "k", "t", "x", "y")
        .select("dw").as[Double].head()
    assert(run(df) === run(df.repartition(7)))
  }
}
