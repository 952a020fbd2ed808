package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecomposeIntegralSpec extends SparkSpec {
  import spark.implicits._

  private val pos7 = pmod(col("t"), lit(7))

  private def decomp(rows: Seq[(String, Long, Long)], period: Int) =
    Decompose.additiveIntegral(
      rows.toDF("k", "t", "v"), Seq("k"), "t", "v", period,
      pmod(col("t"), lit(period)))

  test("pure weekly signal: trend flat, seasonal exact, residual exactly zero") {
    // v = 10 + (t % 7): MA(7) == 13 everywhere, seasonal == pos - 3
    val rows = (0L until 28L).map(t => ("a", t, 10L + t % 7))
    val out = decomp(rows, 7)
      .select("t", "trend", "seasonal", "resid")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    // first/last 3 rows: no full window
    (out.take(3) ++ out.takeRight(3)).foreach { r =>
      assert(r._2.isEmpty && r._4.isEmpty, s"edge row $r must have null trend")
    }
    out.slice(3, 25).foreach { case (t, tr, se, re) =>
      assert(tr.contains(13.0), s"t=$t trend")
      assert(se.contains((t % 7).toDouble - 3.0), s"t=$t seasonal")
      assert(re.contains(0.0), s"t=$t resid must be exactly zero")
    }
  }

  test("linear trend + weekly signal recovers both, residual exactly zero") {
    // v = 2t + (t % 7): centered MA(7) of 2t is 2t, plus mean-season 3
    val rows = (0L until 35L).map(t => ("a", t, 2 * t + t % 7))
    val out = decomp(rows, 7)
      .filter(col("trend").isNotNull)
      .select("t", "trend", "seasonal", "resid")
      .as[(Long, Double, Double, Double)].collect()
    out.foreach { case (t, tr, se, re) =>
      assert(tr === 2.0 * t + 3.0, s"t=$t trend")
      assert(se === (t % 7).toDouble - 3.0, s"t=$t seasonal")
      assert(re === 0.0, s"t=$t resid")
    }
  }

  test("even period uses the half-weight MA and still nulls the edges") {
    // v = s[t % 4] with period 4: the 2x4 MA spans exactly one cycle
    // (half-weighted endpoints 4 apart share a position) -> constant
    val s = Seq(5L, 9L, 1L, 13L) // mean 7
    val rows = (0L until 20L).map(t => ("a", t, s((t % 4).toInt)))
    val out = decomp(rows, 4)
      .select("t", "trend", "seasonal", "resid")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    (out.take(2) ++ out.takeRight(2)).foreach(r =>
      assert(r._2.isEmpty, s"edge $r"))
    out.slice(2, 18).foreach { case (t, tr, se, re) =>
      assert(tr.contains(7.0), s"t=$t trend")
      assert(se.contains(s((t % 4).toInt).toDouble - 7.0), s"t=$t seasonal")
      assert(re.contains(0.0), s"t=$t resid")
    }
  }

  test("keys decompose independently") {
    val rows = (0L until 21L).flatMap(t =>
      Seq(("up", t, 3 * t), ("flat", t, 100L)))
    val out = decomp(rows, 7).filter(col("trend").isNotNull)
      .select("k", "t", "trend", "seasonal")
      .as[(String, Long, Double, Double)].collect()
    out.foreach {
      case ("up", t, tr, se)   => assert(tr === 3.0 * t && se === 0.0)
      case ("flat", _, tr, se) => assert(tr === 100.0 && se === 0.0)
      case other               => fail(other.toString)
    }
  }

  test("non-integral value columns are rejected") {
    val df = Seq(("a", 1L, 1.5)).toDF("k", "t", "v")
    val ex = intercept[IllegalArgumentException] {
      Decompose.additiveIntegral(df, Seq("k"), "t", "v", 7, pos7)
    }
    assert(ex.getMessage.contains("integral"))
  }
}
