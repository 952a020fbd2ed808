package graft.operators

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("radius is the ceil((1-α)(n+1))-th calibration residual") {
    // n=9, 90%: k = ceil(9*10/10) = 9 → the 9th smallest of 1..9 = 9.0
    val cal = (1 to 9).map(i => ("g", i.toDouble)).toDF("k", "resid")
    val r = Conformal.radius(cal, "k", "resid", 9, 10).collect()(0)
    assert(r.getLong(1) === 9L && r.getDouble(2) === 9.0)
    // n=19, 90%: k = ceil(9*20/10) = 18 → 18.0
    val cal2 = (1 to 19).map(i => ("g", i.toDouble)).toDF("k", "resid")
    val r2 = Conformal.radius(cal2, "k", "resid", 9, 10).collect()(0)
    assert(r2.getDouble(2) === 18.0)
  }

  test("a calibration split too small for the coverage yields a null radius") {
    // n=5, 90%: k = ceil(9*6/10) = 6 > 5 → honest null, n_cal kept
    val cal = (1 to 5).map(i => ("g", i.toDouble)).toDF("k", "resid")
    val r = Conformal.radius(cal, "k", "resid", 9, 10).collect()
    assert(r.length === 1 && r(0).getLong(1) === 5L && r(0).isNullAt(2))
  }

  test("tied residuals at the cut rank still return the rank's value") {
    val cal = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 3.0, 3.0, 3.0, 4.0)
      .map(("g", _)).toDF("k", "resid")
    val r = Conformal.radius(cal, "k", "resid", 9, 10).collect()(0)
    assert(r.getDouble(2) === 4.0) // k = 9 of 9
  }

  test("coverage counts test residuals within the radius, exact ppm") {
    val cal = (1 to 9).map(i => ("g", i.toDouble)).toDF("k", "resid")
    val rad = Conformal.radius(cal, "k", "resid", 9, 10) // q_hat = 9
    val test = (Seq(1.0, 5.0, 9.0, 10.0) ++ Seq(2.0, 3.0, 8.5, 11.0))
      .map(("g", _)).toDF("k", "resid")
    val c = Conformal.coverage(test, rad, "k", "resid").collect()(0)
    assert(c.getLong(2) === 8L)     // n_test
    assert(c.getLong(4) === 6L)     // covered: all but 10.0 and 11.0
    assert(c.getLong(5) === 750000L) // 6/8 exactly
  }

  test("radius is monotone in the coverage level") {
    val cal = (1 to 99).map(i => ("g", i.toDouble)).toDF("k", "resid")
    def at(num: Int) = Conformal.radius(cal, "k", "resid", num, 100)
      .collect()(0).getDouble(2)
    assert(at(80) <= at(90) && at(90) <= at(95) && at(95) <= at(99))
  }

  test("sketch radius tracks the exact radius on a large key") {
    val cal = (1 to 10000).map(i => ("g", i.toDouble)).toDF("k", "resid")
    val exact = Conformal.radius(cal, "k", "resid", 9, 10)
      .collect()(0).getDouble(2)
    val approx = Conformal.radiusSketch(cal, "k", "resid", 9, 10)
      .collect()(0).getDouble(1)
    // KLL k=200 has ~1.65% rank error at 99% confidence; 3% of the
    // 0..10000 range is a generous, deterministic-enough envelope
    assert(math.abs(approx - exact) < 300.0,
      s"sketch $approx vs exact $exact")
  }

  test("per-key isolation: each key gets its own radius and coverage") {
    val cal = ((1 to 9).map(i => ("a", i.toDouble)) ++
      (1 to 9).map(i => ("b", i.toDouble * 10))).toDF("k", "resid")
    val rad = Conformal.radius(cal, "k", "resid", 9, 10)
    val got = rad.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got === Map("a" -> 9.0, "b" -> 90.0))
  }
}
