package graft.operators

import graft.SparkSpec

class AutoCorrSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)], maxLag: Int) =
    AutoCorr.acf(rows.toDF("k", "i", "v"), "k", "i", "v", maxLag)
      .select("k", "lag", "n", "acf")
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("alternating series: lag 1 is -1, lag 2 is +1") {
    val rows = (1L to 8L).map(i =>
      ("k", i, if (i % 2 == 0) 1.0 else -1.0))
    val out = run(rows, 2)
    // the fixed-shape double formula rounds at the last ulp on the
    // unbalanced lag-1 pair set (4 vs 3 of each sign)
    assert(out(("k", 1))._1 == 7L &&
      math.abs(out(("k", 1))._2.get - (-1.0)) < 1e-12)
    assert(out(("k", 2)) == ((6L, Some(1.0))))
  }

  test("linear series is exactly 1 at every lag (shift is affine)") {
    val rows = (1L to 10L).map(i => ("k", i, i.toDouble))
    val out = run(rows, 3)
    (1 to 3).foreach { l =>
      val (n, acf) = out(("k", l))
      assert(n == 10L - l && acf.contains(1.0), s"lag $l -> ($n, $acf)")
    }
  }

  test("constant series has no variance: acf is null, n still counts") {
    val out = run((1L to 5L).map(i => ("k", i, 7.0)), 1)
    assert(out(("k", 1)) == ((4L, None)))
  }

  test("keys are isolated: no pair crosses a key boundary") {
    val rows = (1L to 4L).map(i => ("a", i, i.toDouble)) ++
      (1L to 4L).map(i => ("b", i, (5 - i).toDouble))
    val out = run(rows, 1)
    assert(out(("a", 1))._1 == 3L &&
      math.abs(out(("a", 1))._2.get - 1.0) < 1e-12)
    assert(out(("b", 1))._1 == 3L && // descending linear: still affine
      math.abs(out(("b", 1))._2.get - 1.0) < 1e-12)
    assert(out.size == 2)
  }

  test("acf equals corrByKey over explicitly shifted pairs") {
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val rows = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
    val out = run(rows, 2)
    for (l <- 1 to 2) {
      val pairs = xs.dropRight(l).zip(xs.drop(l))
        .map { case (x, y) => ("k", x, y) }
      val expect = Stats.corrByKey(pairs.toDF("k", "x", "y"), "k", "x", "y")
        .select("n", "corr").as[(Long, Option[Double])].collect().head
      assert(out(("k", l)) == expect, s"lag $l")
    }
  }

  test("plan: all lags share one window sort, no join") {
    val df = (1L to 20L).map(i => ("k", i, i.toDouble)).toDF("k", "i", "v")
    val p = AutoCorr.acf(df, "k", "i", "v", 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"acf must not join:\n$p")
    val sorts = "\\bSort \\[".r.findAllIn(p).length
    assert(sorts <= 1, s"all lag windows must share one sort:\n$p")
  }

  private def runCcf(rows: Seq[(String, Long, Double, Double)],
      maxLag: Int) =
    AutoCorr.ccf(rows.toDF("k", "i", "x", "y"), "k", "i", "x", "y", maxLag)
      .select("k", "lag", "n", "ccf")
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("ccf: y = x shifted by 2 peaks exactly at lag 2") {
    // irregular base series so only the true shift is affine
    val x = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0)
    val rows = x.indices.drop(2).map(i =>
      ("k", i.toLong, x(i), x(i - 2)))
    val out = runCcf(rows, 3)
    assert(math.abs(out(("k", 2))._2.get - 1.0) < 1e-12,
      s"lag2: ${out(("k", 2))}")
    assert(out(("k", 0))._2.get < 0.99 && out(("k", 1))._2.get < 0.99)
  }

  test("ccf: lag 0 is the plain Pearson correlation of (x, y)") {
    val rows = Seq(("k", 1L, 1.0, 2.0), ("k", 2L, 2.0, 4.0),
      ("k", 3L, 3.0, 6.0))
    val out = runCcf(rows, 0)
    assert(out(("k", 0))._1 === 3L)
    assert(math.abs(out(("k", 0))._2.get - 1.0) < 1e-12)
  }

  test("ccf: pair counts shrink by one per lag and keys are isolated") {
    val rows = (1L to 6L).flatMap(i => Seq(
      ("a", i, i.toDouble, 7.0 - i), ("b", i, (i % 3).toDouble, i * 2.0)))
    val out = runCcf(rows, 2)
    (0 to 2).foreach { l =>
      assert(out(("a", l))._1 === 6L - l)
      assert(out(("b", l))._1 === 6L - l)
    }
    assert(math.abs(out(("a", 0))._2.get - (-1.0)) < 1e-12)
  }

  test("ccf plan: one window sort, map-side unpivot, no join") {
    val df = (1L to 20L).map(i => ("k", i, i.toDouble, (i % 4).toDouble))
      .toDF("k", "i", "x", "y")
    val p = AutoCorr.ccf(df, "k", "i", "x", "y", 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"ccf must not join:\n$p")
    val sorts = "\\bSort \\[".r.findAllIn(p).length
    assert(sorts <= 1, s"all lag windows must share one sort:\n$p")
  }
}
