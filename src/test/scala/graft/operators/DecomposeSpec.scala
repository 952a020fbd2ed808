package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecomposeSpec extends SparkSpec {
  import spark.implicits._

  private def series(f: Long => Double, n: Int, key: String = "k") =
    (0L until n.toLong).map(p => (key, p, f(p))).toDF("k", "pos", "v")

  test("a pure weekly signal on a flat level is recovered exactly") {
    // value = 100 + phase pattern (sums to zero over the period):
    // trend must read 100.0 everywhere the window is full, seasonal
    // must equal the pattern, residual must be 0
    val pat = Array(3.0, -1.0, 2.0, -4.0, 0.0, 1.0, -1.0)
    val df = series(p => 100.0 + pat((p % 7).toInt), 28)
    val got = Decompose.additiveMicro(df, "k", "pos", "v", 7, 3)
      .filter(col("trend").isNotNull)
      .select("pos", "trend", "seasonal", "resid")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length == 22) // 28 rows minus 3 edge rows each side
    got.foreach { case (p, t, s, r) =>
      assert(t == 100.0, s"trend at $p: $t")
      assert(s == pat((p % 7).toInt), s"seasonal at $p: $s")
      assert(r == 0.0, s"resid at $p: $r")
    }
  }

  test("the decomposition reconstructs the value exactly (interior)") {
    val df = series(p => 50.0 + 2.5 * p + (p * 37 % 11).toDouble, 30)
    val got = Decompose.additiveMicro(df, "k", "pos", "v", 7, 3)
      .filter(col("trend_micro").isNotNull)
      .select(col("v"), col("trend_micro"), col("seasonal_micro"),
        col("resid_micro"))
      .as[(Double, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (v, t, s, r) =>
      assert(math.round(v * 1e6) == t + s + r,
        s"v=$v != ($t + $s + $r)/1e6")
    }
  }

  test("seasonal components re-center to ~0 over one period") {
    val df = series(p => 10.0 * ((p * 13) % 7).toDouble + 0.5 * p, 35)
    val seas = Decompose.additiveMicro(df, "k", "pos", "v", 7, 3)
      .filter(col("pos") < 7).select("seasonal_micro")
      .as[Long].collect()
    assert(seas.length == 7)
    // truncation leaves at most 1 micro per phase uncancelled
    assert(math.abs(seas.sum) <= 7, s"seasonal sum ${seas.sum}")
  }

  test("a series shorter than the window survives with null components") {
    val df = series(p => p.toDouble, 4)
    val got = Decompose.additiveMicro(df, "k", "pos", "v", 7, 3)
      .select("pos", "trend_micro").as[(Long, Option[Long])].collect()
    assert(got.length == 4)
    assert(got.forall(_._2.isEmpty))
  }
}
