package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

class HuberIrlsSpec extends SparkSpec {
  import spark.implicits._

  test("with delta above every residual, one round reduces to OLS") {
    val df = Seq((1.0, 1.0, 0.0), (2.0, 2.0, 1.0), (3.5, 3.0, 0.0),
      (4.0, 4.0, 1.0), (5.5, 5.0, 0.0))
      .toDF("y", "x1", "x2")
    val h = LinearModel.huberIrls(df, "y", "x1", "x2",
      delta = 1e6, iters = 1)
      .select("b0", "b1", "b2").as[(Double, Double, Double)].head()
    val ols = LinearModel.ridgeByKey(df.withColumn("k", lit(1)),
      "k", "y", "x1", "x2", 0.0)
      .select("b0", "b1", "b2").as[(Double, Double, Double)].head()
    assert(math.abs(h._1 - ols._1) < 1e-9, s"$h vs $ols")
    assert(math.abs(h._2 - ols._2) < 1e-9)
    assert(math.abs(h._3 - ols._3) < 1e-9)
  }

  test("a gross outlier barely moves the Huber slope but wrecks OLS") {
    // y = 2x exactly, except one wild point; x2 alternates so the
    // normal matrix stays nonsingular
    val base = (1 to 40).map(i => (2.0 * i, i.toDouble, (i % 2).toDouble))
    val poisoned = base :+ (10000.0, 20.5, 1.0)
    val df = poisoned.toDF("y", "x1", "x2")
    val h = LinearModel.huberIrls(df, "y", "x1", "x2",
      delta = 5.0, iters = 6)
      .select("b1").as[Double].head()
    val ols = LinearModel.ridgeByKey(df.withColumn("k", lit(1)),
      "k", "y", "x1", "x2", 0.0).select("b1").as[Double].head()
    assert(math.abs(h - 2.0) < 0.05, s"huber slope $h")
    assert(math.abs(ols - 2.0) > 0.5, s"ols must be dragged: $ols")
  }

  test("exactly-zero feature column yields null coefficients") {
    val df = Seq((1.0, 0.0, 1.0), (2.0, 0.0, 2.0), (3.0, 0.0, 3.0))
      .toDF("y", "x1", "x2")
    val r = LinearModel.huberIrls(df, "y", "x1", "x2", 10.0, 2).head()
    assert(r.getLong(0) === 3L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }
}
