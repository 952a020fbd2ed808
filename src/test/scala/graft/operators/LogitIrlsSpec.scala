package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogitIrlsSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Double, Double)]) =
    rows.toDF("y", "x1", "x2")

  test("grid IRLS matches the driver-side logisticFit to quantization") {
    // discrete features, mixed outcomes per cell
    val rows = for {
      x1 <- Seq(0.0, 1.0, 2.0); x2 <- Seq(0.0, 1.0); rep <- 1 to 20
    } yield {
      val p = 1.0 / (1.0 + math.exp(-(-1.0 + 0.8 * x1 - 0.5 * x2)))
      // deterministic pseudo-outcome: spread reps across the logistic
      ((if (rep / 20.0 <= p) 1L else 0L), x1, x2)
    }
    val df = mk(rows)
    val grid = LinearModel.logisticIrlsGrid(df, "y", "x1", "x2", iters = 4)
      .select("b0", "b1", "b2").as[(Double, Double, Double)].head()
    val driver = LinearModel.logisticFit(df, "y", Seq("x1", "x2"),
      iters = 4, ridge = 0.0).get
    assert(math.abs(grid._1 - driver(0)) < 1e-6, s"$grid vs $driver")
    assert(math.abs(grid._2 - driver(1)) < 1e-6)
    assert(math.abs(grid._3 - driver(2)) < 1e-6)
  }

  test("coefficient signs follow the planted effect") {
    val rows = (for (rep <- 1 to 50) yield Seq(
      (1L, 1.0, 0.0), (0L, 0.0, 1.0), (1L, 1.0, 1.0), (0L, 0.0, 0.0),
      (1L, 1.0, 0.0), (1L, 0.0, 0.0))).flatten
    val out = LinearModel.logisticIrlsGrid(mk(rows), "y", "x1", "x2")
      .select("n", "b1", "b2").as[(Long, Double, Double)].head()
    assert(out._1 === 300L)
    assert(out._2 > 0.0) // x1 = 1 rows skew positive
    assert(out._3 < 0.0) // x2 = 1 rows skew negative
  }

  test("count column n survives; singular grid yields null betas") {
    // constant-ZERO feature x1 → its normal-matrix row is exactly 0
    // even in double arithmetic → det == 0.0 → null coefficients
    val df = mk(Seq((1L, 0.0, 1.0), (0L, 0.0, 0.0), (1L, 0.0, 1.0)))
    val out = LinearModel.logisticIrlsGrid(df, "y", "x1", "x2")
    val r = out.head()
    assert(r.getLong(0) === 3L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }
}
