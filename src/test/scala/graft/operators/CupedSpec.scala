package graft.operators

import graft.SparkSpec

class CupedSpec extends SparkSpec {
  import spark.implicits._

  private def readout(rows: Seq[(String, Double, Double)]) =
    Cuped.adjustedMeans(rows.toDF("variant", "y", "x"), "variant", "y", "x")
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap

  test("perfectly predictive covariate removes all variance") {
    // y = 2x exactly; a fake 'effect' is only covariate imbalance
    val rows = Seq(
      ("A", 2.0, 1.0), ("A", 4.0, 2.0), ("A", 6.0, 3.0),
      ("B", 8.0, 4.0), ("B", 10.0, 5.0), ("B", 12.0, 6.0))
    val out = readout(rows)
    assert(out("A")._5.get === 2.0) // theta
    assert(out("A")._6.get === 1.0) // var_reduction
    // adjustment: mean_y - theta (mean_x - pooled_mean_x); pooled mean
    // x = 3.5, so both variants adjust to the SAME 2 * 3.5 = 7
    assert(out("A")._4.get === 7.0)
    assert(out("B")._4.get === 7.0)
  }

  test("uncorrelated covariate leaves means untouched (theta 0)") {
    val rows = Seq(
      ("A", 1.0, 5.0), ("A", 3.0, 5.0), ("A", 1.0, 6.0), ("A", 3.0, 6.0),
      ("B", 2.0, 5.0), ("B", 4.0, 5.0), ("B", 2.0, 6.0), ("B", 4.0, 6.0))
    val out = readout(rows)
    assert(out("A")._5.get === 0.0)
    assert(out("A")._6.get === 0.0)
    assert(out("A")._4.get === out("A")._3) // adjusted == raw
    assert(out("B")._4.get === 4.0 - 1.0) // mean_y 3.0 unchanged
  }

  test("zero-variance covariate: theta and adjustment are null, raw mean stays") {
    val rows = Seq(("A", 1.0, 7.0), ("A", 3.0, 7.0), ("B", 5.0, 7.0))
    val out = readout(rows)
    assert(out("A")._3 === 2.0)
    assert(out("A")._4.isEmpty && out("A")._5.isEmpty && out("A")._6.isEmpty)
  }

  test("the adjustment preserves the pooled mean of y (mean-zero shift)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      val x = rnd.nextInt(50).toDouble
      val lift = if (i % 2 == 0) 5.0 else 0.0
      val v = if (i % 2 == 0) "B" else "A"
      (v, 3.0 * x + rnd.nextInt(10) + lift, x)
    }
    val out = readout(rows)
    val (na, ya, yaAdj) = (out("A")._2, out("A")._3, out("A")._4.get)
    val (nb, yb, ybAdj) = (out("B")._2, out("B")._3, out("B")._4.get)
    val pooledRaw = (na * ya + nb * yb) / (na + nb)
    val pooledAdj = (na * yaAdj + nb * ybAdj) / (na + nb)
    assert(math.abs(pooledRaw - pooledAdj) < 1e-9,
      "CUPED must not move the pooled outcome mean")
    // variance reduction must be substantial with a 3x-slope covariate
    assert(out("A")._6.get > 0.9)
    // the adjusted delta still shows the true ~5.0 lift
    assert(math.abs((ybAdj - yaAdj) - 5.0) < 1.0)
  }

  test("null covariate/outcome rows are dropped pairwise-complete") {
    val rows = Seq(
      ("A", Some(2.0), Some(1.0)), ("A", None, Some(9.0)),
      ("A", Some(4.0), None), ("B", Some(6.0), Some(3.0)),
      ("B", Some(8.0), Some(4.0)))
    val out = Cuped.adjustedMeans(
      rows.toDF("variant", "y", "x"), "variant", "y", "x")
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("A")._2 === 1L)
    assert(out("B")._2 === 2L)
  }

  test("diff-in-diff recovers a hand-computed effect with Welch SE") {
    // control: pre mean 10, post mean 12 (drift +2)
    // treated: pre mean 20, post mean 25 (drift +5) -> DiD = 3
    val rows = Seq(
      (0, 0, 9.0), (0, 0, 11.0), (0, 0, 10.0),
      (0, 1, 11.0), (0, 1, 13.0), (0, 1, 12.0),
      (1, 0, 19.0), (1, 0, 21.0), (1, 0, 20.0),
      (1, 1, 24.0), (1, 1, 26.0), (1, 1, 25.0))
    val r = Cuped.diffInDiff(rows.toDF("treat", "post", "y"),
      "treat", "post", "y").collect()(0)
    val get = (name: String) => r.getAs[Any](name)
    assert(get("n_c0") === 3L && get("n_t1") === 3L)
    assert(math.abs(r.getAs[Double]("did") - 3.0) < 1e-12)
    // every cell has s^2 = 1, n = 3 -> se = sqrt(4/3)
    assert(math.abs(r.getAs[Double]("se_did") - math.sqrt(4.0 / 3.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_c0") - 10.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_t1") - 25.0) < 1e-12)
  }

  test("diff-in-diff: empty cell nulls did; single-row cells null only the SE") {
    val noCell = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0))
    val r1 = Cuped.diffInDiff(noCell.toDF("treat", "post", "y"),
      "treat", "post", "y").collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("did")) &&
      r1.isNullAt(r1.fieldIndex("se_did")))
    val thin = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 7.0))
    val r2 = Cuped.diffInDiff(thin.toDF("treat", "post", "y"),
      "treat", "post", "y").collect()(0)
    assert(math.abs(r2.getAs[Double]("did") - 3.0) < 1e-12)
    assert(r2.isNullAt(r2.fieldIndex("se_did")))
  }
}
