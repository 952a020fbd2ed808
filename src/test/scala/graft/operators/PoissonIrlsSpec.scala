package graft.operators

import graft.SparkSpec

class PoissonIrlsSpec extends SparkSpec {
  import spark.implicits._

  test("recovers an exact log-linear rate structure") {
    // cells x1 = 0,1,2 with y fixed at exp-spaced rates 2,4,8 at BOTH
    // levels of an inert x2 (varying, effect 0 — a constant x2 would
    // make the normal matrix singular): MLE is b0 = b1 = ln 2, b2 = 0
    val rows = for {
      k <- 0 to 2
      j <- 0 to 1
      _ <- 1 to 50
    } yield (math.pow(2.0, k + 1).toLong, k.toDouble, j.toDouble)
    val df = rows.toDF("y", "x1", "x2")
    val r = LinearModel.poissonIrlsGrid(df, "y", "x1", "x2", iters = 8)
      .select("n", "b0", "b1", "b2")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 === 300L)
    assert(math.abs(r._2 - math.log(2.0)) < 1e-3)
    assert(math.abs(r._3 - math.log(2.0)) < 1e-3)
    assert(math.abs(r._4) < 1e-3)
  }

  test("a single-cell grid is singular: null coefficients, real n") {
    val df = Seq((3L, 1.0, 1.0), (5L, 1.0, 1.0)).toDF("y", "x1", "x2")
    val row = LinearModel.poissonIrlsGrid(df, "y", "x1", "x2").collect().head
    assert(row.getLong(0) === 2L)
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("deterministic under repartitioning") {
    val df = (1 to 500).map(i =>
      ((i % 7).toLong, (i % 5).toDouble, (i % 3).toDouble))
      .toDF("y", "x1", "x2")
    def run(d: org.apache.spark.sql.DataFrame) =
      LinearModel.poissonIrlsGrid(d, "y", "x1", "x2")
        .select("b0", "b1", "b2").as[(Double, Double, Double)].head()
    assert(run(df) === run(df.repartition(7)))
  }

  test("the eta clamp keeps a degenerate start finite") {
    // all-zero y: mu clamps at the 1e-8 floor, moments stay finite
    val df = Seq((0L, 0.0, 0.0), (0L, 1.0, 0.0), (0L, 0.0, 1.0))
      .toDF("y", "x1", "x2")
    val row = LinearModel.poissonIrlsGrid(df, "y", "x1", "x2").collect().head
    assert(row.getLong(0) === 3L) // runs to completion, no NaN blowup
  }
}
