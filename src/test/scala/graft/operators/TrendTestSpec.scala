package graft.operators

import graft.SparkSpec

class TrendTestSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)]) =
    TrendTest.mannKendall(rows.toDF("k", "t", "v"), "k", "t", "v")
      .select("k", "n", "s_stat", "var18", "z")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap

  test("strictly increasing series: S = n(n-1)/2, textbook z") {
    val n = 10
    val out = run((0 until n).map(t => ("a", t.toLong, t.toDouble)))("a")
    assert(out._2 == n)
    assert(out._3 == n * (n - 1) / 2) // every pair ascends
    val var18 = n.toLong * (n - 1) * (2 * n + 5) -
      n.toLong * 0 // no ties: each group t=1 -> t(t-1)(2t+5)=0
    assert(out._4 == var18)
    val z = (out._3.toDouble - 1.0) / math.sqrt(var18 / 18.0)
    assert(out._5.contains(z))
    assert(z > 3.0, s"a clean monotone trend must be significant: $z")
  }

  test("strictly decreasing mirrors the sign; flat series is z=0 w/ null var") {
    val dec = run((0 until 10).map(t => ("a", t.toLong, -t.toDouble)))("a")
    assert(dec._3 == -45)
    assert(dec._5.exists(_ < -3.0))
    // constant series: every pair ties -> S=0, var18 = n(n-1)(2n+5) -
    // t(t-1)(2t+5) with one group of t=n -> 0 -> z null
    val flat = run((0 until 10).map(t => ("a", t.toLong, 5.0)))("a")
    assert(flat._3 == 0 && flat._4 == 0 && flat._5.isEmpty)
  }

  test("tie correction: duplicated values shrink var18 exactly") {
    // values 1,1,2,2,3,3 over 6 ticks: two-per-value groups
    val out = run(Seq(1.0, 1.0, 2.0, 2.0, 3.0, 3.0).zipWithIndex
      .map { case (v, t) => ("a", t.toLong, v) })("a")
    val n = 6L
    val tie = 3L * (2L * 1L * 9L) // three groups of t=2: t(t-1)(2t+5)=18
    assert(out._4 == n * (n - 1) * (2 * n + 5) - tie)
    assert(out._3 > 0) // still ascending overall
  }

  test("keys are independent and output is layout-stable") {
    val rows = (0 until 30).flatMap(t => Seq(
      ("up", t.toLong, t.toDouble),
      ("noise", t.toLong, ((t * 7919) % 13).toDouble)))
    val a = run(rows)
    val b = TrendTest.mannKendall(
        rows.toDF("k", "t", "v").repartition(7), "k", "t", "v")
      .select("k", "n", "s_stat", "var18", "z")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(a == b, "repartitioning changed the readout")
    assert(a("up")._5.exists(_ > 3.0))
    assert(a("noise")._5.exists(z => math.abs(z) < 3.0))
  }
}
