package graft.operators

import graft.SparkSpec

class CoxSpec extends SparkSpec {
  import spark.implicits._

  // (duration, event, x)
  private def mk(rows: Seq[(Double, Long, Long)]) =
    rows.toDF("dur", "ev", "x")

  test("x = 1 failing uniformly earlier gives beta > 0, hr > 1") {
    val rows = (1 to 30).map(i => (i.toDouble, 1L, 1L)) ++
      (1 to 30).map(i => (i.toDouble + 30.0, 1L, 0L))
    val r = Survival.coxBinary(mk(rows), "dur", "ev", "x", iters = 4)
      .select("beta", "hr", "se").head()
    assert(r.getDouble(0) > 0.5, s"beta ${r.getDouble(0)}")
    assert(r.getDouble(1) > 1.5)
    assert(r.getDouble(2) > 0.0)
  }

  test("covariate independent of timing gives beta near 0") {
    // x alternates within identical duration structure
    val rows = (1 to 40).map(i => (i.toDouble, 1L, (i % 2).toLong))
    val r = Survival.coxBinary(mk(rows), "dur", "ev", "x", iters = 4)
      .select("beta", "hr").as[(Double, Double)].head()
    assert(math.abs(r._1) < 0.2, s"beta ${r._1}")
    assert(math.abs(r._2 - 1.0) < 0.3)
  }

  test("constant covariate yields a null fit (information is zero)") {
    val rows = (1 to 10).map(i => (i.toDouble, 1L, 1L))
    val r = Survival.coxBinary(mk(rows), "dur", "ev", "x").head()
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("censored subjects stay in the risk set but add no events") {
    // heavy censoring in group 0 must not fake a hazard difference
    val rows = (1 to 20).map(i => (i.toDouble, 1L, 1L)) ++
      (1 to 20).map(i => (i.toDouble, 1L, 0L)) ++
      (1 to 10).map(i => (25.0, 0L, 0L)) // late-censored controls
    val r = Survival.coxBinary(mk(rows), "dur", "ev", "x", iters = 4)
      .select("n", "d", "d1").head()
    assert(r.getLong(0) === 50 && r.getLong(1) === 40 &&
      r.getLong(2) === 20)
  }
}
