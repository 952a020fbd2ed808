package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PointInPolygonSpec extends SparkSpec {
  import spark.implicits._

  private val square = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))
  // concave pentagon with a notch dipping to (3,3) between the top corners
  private val notched =
    Seq((0.0, 0.0), (6.0, 0.0), (6.0, 6.0), (3.0, 3.0), (0.0, 6.0))

  private def inside(pts: Seq[(Double, Double)],
      poly: Seq[(Double, Double)]): Seq[Boolean] = {
    val df = pts.toDF("x", "y")
    df.select(PointInPolygon.contains(col("x"), col("y"), poly).as("in"))
      .as[Boolean].collect().toSeq
  }

  test("unit square: interior in, exterior out") {
    assert(inside(Seq((0.5, 0.5)), square) === Seq(true))
    assert(inside(Seq((1.5, 0.5), (-0.5, 0.5), (0.5, 1.5), (0.5, -0.5)),
      square) === Seq(false, false, false, false))
  }

  test("half-open edges: left boundary is in, right boundary is out") {
    // crossing-rule convention: a point shared by two adjacent tiles
    // counts in exactly one of them
    assert(inside(Seq((0.0, 0.5)), square) === Seq(true))
    assert(inside(Seq((1.0, 0.5)), square) === Seq(false))
  }

  test("concave notch: parity 3 is inside, parity 2 in the notch is out") {
    assert(inside(Seq((1.0, 4.0)), notched) === Seq(true))   // 3 crossings
    assert(inside(Seq((1.0, 5.5)), notched) === Seq(false))  // in the notch
    assert(inside(Seq((3.0, 1.0)), notched) === Seq(true))   // plain inside
  }

  test("sql emitter agrees with the Column form on a probe grid") {
    // the oracle-parity guarantee, checked inside one engine: register
    // the emitted text as a Spark SQL expression and compare verdicts
    val pts = for { i <- -2 to 8; j <- -2 to 8 }
      yield (i + 0.25, j + 0.75)
    val df = pts.toDF("x", "y")
    val viaColumn = df.select(col("x"), col("y"),
      PointInPolygon.contains(col("x"), col("y"), notched).as("in"))
    val viaSql = df.selectExpr("x", "y",
      PointInPolygon.sql("x", "y", notched) + " AS in")
    assert(viaColumn.collect().toSeq === viaSql.collect().toSeq)
  }

  test("horizontal edges never divide by zero or flip parity") {
    // square has two horizontal edges; scan a row crossing them
    val pts = (-1 to 2).map(i => (i + 0.5, 0.0))
    assert(inside(pts, square) === Seq(false, true, false, false))
  }

  test("plan: pure projection — no shuffle, no UDF") {
    val df = Seq((0.5, 0.5)).toDF("x", "y")
    val p = df.filter(PointInPolygon.contains(col("x"), col("y"), notched))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("BatchEvalPython"))
  }
}
