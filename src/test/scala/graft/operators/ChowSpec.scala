package graft.operators

import graft.SparkSpec

class ChowSpec extends SparkSpec {
  import spark.implicits._

  private def seg(s: Boolean, rows: Seq[(Double, Double, Double)]) =
    rows.map { case (y, x1, x2) => (s, y, x1, x2) }

  test("identical relationships across segments give F near zero") {
    // same y ≈ 1 + 2x1 + 0.5x2 pattern in both halves, with an
    // identical 7-cycle wiggle so the within-segment SSE is nonzero
    val rows = for (i <- 1 to 20; s <- Seq(true, false))
      yield (s, 1.0 + 2.0 * i + 0.5 * (i % 3) + 0.01 * (i % 7),
        i.toDouble, (i % 3).toDouble)
    val r = LinearModel.chowTest(rows.toDF("seg", "y", "x1", "x2"),
      "seg", "y", "x1", "x2").head()
    assert(r.getLong(1) === 2)
    assert(math.abs(r.getDouble(4)) < 1e-3, s"F ≈ 0, got ${r.getDouble(4)}")
  }

  test("a slope break produces a large F") {
    val a = seg(true, (1 to 20).map(i =>
      (2.0 * i + 0.3 * (i % 4) + 0.01 * (i % 7),
        i.toDouble, (i % 4).toDouble)))
    val b = seg(false, (1 to 20).map(i =>
      (5.0 * i + 0.3 * (i % 4) + 0.01 * (i % 7),
        i.toDouble, (i % 4).toDouble)))
    val r = LinearModel.chowTest((a ++ b).toDF("seg", "y", "x1", "x2"),
      "seg", "y", "x1", "x2").head()
    assert(r.getDouble(4) > 100.0, s"break must surface: ${r.getDouble(4)}")
  }

  test("three segments refuse an F (guarded, not assumed)") {
    val rows = Seq(("a", 1.0, 1.0, 0.0), ("a", 2.0, 2.0, 1.0),
      ("a", 3.5, 3.0, 0.0), ("a", 4.1, 4.0, 1.0),
      ("b", 1.0, 1.0, 0.0), ("b", 2.2, 2.0, 1.0),
      ("b", 3.1, 3.0, 0.0), ("b", 4.0, 4.0, 1.0),
      ("c", 1.0, 1.0, 0.0), ("c", 2.1, 2.0, 1.0),
      ("c", 3.0, 3.0, 0.0), ("c", 4.2, 4.0, 1.0))
    val r = LinearModel.chowTest(rows.toDF("seg", "y", "x1", "x2"),
      "seg", "y", "x1", "x2").head()
    assert(r.getLong(1) === 3)
    assert(r.isNullAt(4))
  }
}
