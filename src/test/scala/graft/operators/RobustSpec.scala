package graft.operators

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("median, MAD, and flags on a known group") {
    // values 1..9 plus a gross outlier 1000 (n=10):
    // rank-select median = value at rank ceil(0.5*10)=5 -> 5.0;
    // absdevs = {4,3,2,1,0,1,2,3,4,995}, sorted rank 5 -> 2.0 = MAD;
    // |x-5| > 3*2=6 flags only 1000.
    val df = ((1 to 9).map(i => (i.toLong, "g", i.toDouble)) :+
      (10L, "g", 1000.0)).toDF("id", "k", "v")
    val out = Robust.madOutliers(df, "k", "v", "id", 3.0)
      .select("id", "med", "mad", "is_outlier")
      .as[(Long, Double, Double, Boolean)].collect()
    assert(out.forall(r => r._2 == 5.0 && r._3 == 2.0))
    assert(out.filter(_._4).map(_._1).toSeq == Seq(10L))
  }

  test("groups are independent and nulls are excluded") {
    val df = Seq(
      (1L, "a", Some(1.0)), (2L, "a", Some(2.0)), (3L, "a", Some(3.0)),
      (4L, "a", None),
      (5L, "b", Some(100.0)), (6L, "b", Some(200.0)), (7L, "b", Some(300.0)))
      .toDF("id", "k", "v")
    val out = Robust.madOutliers(df, "k", "v", "id", 3.0)
      .select("id", "k", "med", "mad")
      .as[(Long, String, Double, Double)].collect()
    assert(out.length == 6) // the null row is gone
    assert(out.filter(_._2 == "a").forall(r => r._3 == 2.0 && r._4 == 1.0))
    assert(out.filter(_._2 == "b").forall(r => r._3 == 200.0 && r._4 == 100.0))
  }

  test("constant group has MAD 0 and any deviation flags") {
    val df = (Seq.fill(5)(7.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, "c", v) } :+ (99L, "c", 7.5)).toDF("id", "k", "v")
    val out = Robust.madOutliers(df, "k", "v", "id", 3.0)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(99L)) // 0.5 > 3*0 — MAD-0 groups flag every deviation
    assert(!out(0L))
  }

  private def wmedian(rows: Seq[(String, Long, Double, Double)]) =
    Robust.weightedMedian(rows.toDF("k", "id", "v", "w"),
      "k", "v", "w", "id")
      .as[(String, Double)].collect().toMap

  test("weighted median: heavy weight drags the median") {
    // unweighted median of {1,2,3} is 2; weight 10 on the 3 pulls it up:
    // total 12, half 6 -> first v with runw*2 >= 12 is 3 (runw=12).
    assert(wmedian(Seq(("k", 1L, 1.0, 1.0), ("k", 2L, 2.0, 1.0),
      ("k", 3L, 3.0, 10.0))) == Map("k" -> 3.0))
  }

  test("weighted median: equal weights match the lower median") {
    assert(wmedian(Seq(("k", 1L, 1.0, 1.0), ("k", 2L, 2.0, 1.0),
      ("k", 3L, 3.0, 1.0), ("k", 4L, 4.0, 1.0))) == Map("k" -> 2.0))
  }

  test("weighted median: exact half boundary takes the lower value") {
    // weights 1,1 on values 5,9: runw at 5 is 1, 2*1 >= 2 -> 5.
    assert(wmedian(Seq(("k", 1L, 5.0, 1.0), ("k", 2L, 9.0, 1.0)))
      == Map("k" -> 5.0))
  }

  test("weighted median: non-positive weights are excluded, keys split") {
    val rows = Seq(("a", 1L, 1.0, 0.0), ("a", 2L, 2.0, 1.0),
      ("a", 3L, 100.0, -5.0), ("b", 4L, 42.0, 2.5))
    assert(wmedian(rows) == Map("a" -> 2.0, "b" -> 42.0))
  }

  private def kendall(rows: Seq[(String, Long, Double, Double)]) =
    Robust.kendallByKey(rows.toDF("k", "id", "x", "y"), "k", "id", "x", "y")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap

  test("kendall: hand-computed tau-b without ties") {
    // (1,10) (2,20) (3,15): C,C,D -> tau_b = (2-1)/3
    val out = kendall(Seq(("k", 1L, 1.0, 10.0), ("k", 2L, 2.0, 20.0),
      ("k", 3L, 3.0, 15.0)))
    assert(out("k").copy(_6 = None) === ((3L, 2L, 1L, 0L, 0L, None)))
    assert(math.abs(out("k")._6.get - 1.0 / 3.0) < 1e-12)
  }

  test("kendall: tie correction in both margins") {
    // (1,1)(2,1)(2,3)(3,2): ties drop pairs (1,2) and (2,3);
    // C: (1,3)(1,4)(2,4), D: (3,4) -> nc=3 nd=1, tx=ty=1,
    // tau_b = 2 / sqrt((6-1)(6-1)) = 0.4
    val out = kendall(Seq(("k", 1L, 1.0, 1.0), ("k", 2L, 2.0, 1.0),
      ("k", 3L, 2.0, 3.0), ("k", 4L, 3.0, 2.0)))
    assert(out("k").copy(_6 = None) === ((4L, 3L, 1L, 1L, 1L, None)))
    assert(math.abs(out("k")._6.get - 0.4) < 1e-12)
  }

  test("kendall: perfect monotone agreement is exactly 1") {
    val out = kendall((1 to 6).map(i =>
      ("k", i.toLong, i.toDouble, math.pow(i.toDouble, 3))))
    assert(math.abs(out("k")._6.get - 1.0) < 1e-12)
  }

  test("kendall: fully tied margin is degenerate (null tau)") {
    val out = kendall(Seq(("k", 1L, 1.0, 7.0), ("k", 2L, 2.0, 7.0)))
    assert(out("k")._6.isEmpty && out("k")._5 === 1L)
  }

  private def trimmed(rows: Seq[(String, Long, Double)], frac: Double) =
    Robust.trimmedMeanByKey(rows.toDF("k", "id", "v"), "k", "v", "id", frac)
      .as[(String, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("trimmed mean: hand-computed 10% trim drops exactly one per side") {
    // 10 values 1..9 + 1000; k = floor(10*0.1) = 1 -> keep ranks 2..9
    // = {2..9} -> mean 5.5 (the outlier 1000 and the 1 are cut)
    val rows = ((1 to 9).map(i => ("k", i.toLong, i.toDouble)) :+
      ("k", 10L, 1000.0))
    val out = trimmed(rows, 0.1)
    assert(out("k") === ((10L, 8L, Some(5.5))))
  }

  test("trimmed mean: zero trim is the plain mean, decimal-exact") {
    val rows = Seq(("k", 1L, 1.5), ("k", 2L, 2.5), ("k", 3L, 5.0))
    assert(trimmed(rows, 0.0)("k") === ((3L, 3L, Some(3.0))))
  }

  test("trimmed mean: 49% trim of a 2-row key keeps both (floor)") {
    // floor(2*0.49) = 0 -> nothing cut
    val rows = Seq(("k", 1L, 1.0), ("k", 2L, 3.0))
    assert(trimmed(rows, 0.49)("k") === ((2L, 2L, Some(2.0))))
  }

  test("weightedMeanEss: hand-computed mean and Kish ESS") {
    // weights 1,1,2 on values 10,20,40: wmean = (10+20+80)/4 = 27.5
    // ESS = 16/6 = 2.666...; equal weights would give ESS = n = 3
    val rows = Seq(("k", 10.0, 1.0), ("k", 20.0, 1.0), ("k", 40.0, 2.0))
    val out = Robust.weightedMeanEss(rows.toDF("k", "v", "w"),
        "k", "v", "w")
      .as[(String, Long, Option[Double], Option[Double])].head()
    assert(out._2 === 3L && out._3 === Some(27.5))
    assert(math.abs(out._4.get - 16.0 / 6.0) < 1e-12)
  }

  test("weightedMeanEss: one dominating weight collapses ESS toward 1") {
    val rows = (1 to 100).map(i => ("k", i.toDouble, 0.01)) :+
      ("k", 5.0, 1000.0)
    val out = Robust.weightedMeanEss(rows.toDF("k", "v", "w"),
        "k", "v", "w")
      .as[(String, Long, Option[Double], Option[Double])].head()
    assert(out._2 === 101L && out._4.get < 1.01)
    // the 100 tiny weights hold 1 of 1001 units of mass:
    // wmean = (50.5 + 5000) / 1001 exactly
    assert(out._3 === Some(5050.5 / 1001.0))
  }

  test("weightedMeanEss: non-positive weights and nulls are excluded") {
    val rows = Seq(("k", Some(1.0), Some(2.0)), ("k", Some(9.0), Some(0.0)),
      ("k", Some(9.0), None), ("k", None, Some(3.0)))
    val out = Robust.weightedMeanEss(rows.toDF("k", "v", "w"),
        "k", "v", "w")
      .as[(String, Long, Option[Double], Option[Double])].head()
    assert(out._2 === 1L && out._3 === Some(1.0))
  }

  test("trimmed mean sketch path tracks the exact form on clean data") {
    val rows = (1 to 100).map(i => ("k", i.toLong, i.toDouble))
    val exact = trimmed(rows, 0.1)("k")
    val sk = Robust.trimmedMeanSketch(
        rows.toDF("k", "id", "v"), "k", "v", 0.1)
      .as[(String, Long, Long, Option[Double])].head()
    assert(sk._2 === 100L)
    // cuts are approximate (boundary ties keep whole groups): the kept
    // band and mean must straddle the exact answer tightly
    assert(math.abs(sk._3 - exact._2) <= 3L, s"kept ${sk._3}")
    assert(math.abs(sk._4.get - exact._3.get) < 1.5,
      s"sketch ${sk._4} vs exact ${exact._3}")
  }

  test("trimmed mean sketch path kills a gross outlier like the exact form") {
    val rows = (1 to 99).map(i => ("k", i.toLong, i.toDouble)) :+
      ("k", 100L, 1.0e6)
    val sk = Robust.trimmedMeanSketch(
        rows.toDF("k", "id", "v"), "k", "v", 0.1)
      .as[(String, Long, Long, Option[Double])].head()
    assert(sk._4.get < 100.0, s"outlier must be cut: ${sk._4}")
  }

  private def theil(rows: Seq[(String, Long, Double, Double)]) =
    Robust.theilSenByKey(rows.toDF("k", "id", "x", "y"), "k", "id", "x", "y")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("theil-sen: hand-computed lower-median slope and intercept") {
    // slopes: (1,2)->2, (1,3)->0.5, (2,3)->-1; sorted -1, 0.5, 2
    // lower median (rank 2) = 0.5; residuals y-0.5x = 0.5, 2, 0.5;
    // (r, id) order: (0.5,1),(0.5,3),(2,2) -> rank 2 -> 0.5
    val out = theil(Seq(("k", 1L, 1.0, 1.0), ("k", 2L, 2.0, 3.0),
      ("k", 3L, 3.0, 2.0)))
    assert(out("k") === ((3L, 3L, Some(0.5), Some(0.5))))
  }

  test("theil-sen: one wild outlier cannot move the line") {
    // 9 points on y = 2x + 1 plus (100, -500): most pairwise slopes
    // stay 2, so the median slope and median residual are untouched
    val rows = (1 to 9).map(i => ("k", i.toLong, i.toDouble, 2.0 * i + 1)) :+
      ("k", 10L, 100.0, -500.0)
    val out = theil(rows)
    assert(out("k")._3 === Some(2.0) && out("k")._4 === Some(1.0))
  }

  test("theil-sen: all-vertical pairs yield zero pairs, null slope") {
    val out = theil(Seq(("k", 1L, 5.0, 1.0), ("k", 2L, 5.0, 9.0)))
    assert(out("k") === ((2L, 0L, None, None)))
  }

  test("theil-sen: keys are isolated and counted independently") {
    val out = theil(Seq(("a", 1L, 0.0, 0.0), ("a", 2L, 1.0, 3.0),
      ("b", 1L, 0.0, 1.0), ("b", 2L, 2.0, 1.0)))
    assert(out("a") === ((2L, 1L, Some(3.0), Some(0.0))))
    assert(out("b") === ((2L, 1L, Some(0.0), Some(1.0))))
  }

  test("kendall: single-row keys survive with zero pairs") {
    val out = kendall(Seq(("solo", 1L, 1.0, 2.0),
      ("duo", 1L, 1.0, 1.0), ("duo", 2L, 2.0, 5.0)))
    assert(out("solo") === ((1L, 0L, 0L, 0L, 0L, None)))
    assert(out("duo")._6 === Some(1.0))
  }

  test("kendallSampled at rate 1 reproduces the exact form per key") {
    val rows = Seq(("k", 1L, 1.0, 1.0), ("k", 2L, 2.0, 1.0),
      ("k", 3L, 2.0, 3.0), ("k", 4L, 3.0, 2.0),
      ("j", 1L, 1.0, 10.0), ("j", 2L, 2.0, 20.0), ("j", 3L, 3.0, 15.0))
    val exact = kendall(rows)
    val out = Robust.kendallSampledByKey(rows.toDF("k", "id", "x", "y"),
        "k", "id", "x", "y", rate = 1.0)
      .as[(String, Long, Long, Long, Long, Long, Long, Long,
        Option[Double])]
      .collect().map(r => r._1 ->
        ((r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9))).toMap
    for (k <- Seq("k", "j")) {
      val (n, nc, nd, tx, ty, tau) = exact(k)
      val s = out(k)
      assert(s._1 === n && s._2 === n) // n_full == n at rate 1
      assert(s._3 === n * (n - 1) / 2) // n_pairs
      assert((s._4, s._5, s._6, s._7) === ((nc, nd, tx, ty)))
      assert(s._8 === tau)
    }
  }

  test("kendallSampled: subsample shrinks pairs; empty keys surface") {
    // 200 rows in one key at 5%: the md5-bucket sample keeps SOME
    // deterministic subset; n_full stays 200, pair count collapses
    val rows = (1 to 200).map(i =>
      ("big", i.toLong, i.toDouble, (i * 7 % 31).toDouble)) :+
      ("tiny", 9999999L, 1.0, 1.0)
    val out = Robust.kendallSampledByKey(rows.toDF("k", "id", "x", "y"),
        "k", "id", "x", "y", rate = 0.05)
      .as[(String, Long, Long, Long, Long, Long, Long, Long,
        Option[Double])]
      .collect().map(r => r._1 ->
        ((r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9))).toMap
    val big = out("big")
    assert(big._1 === 200L)
    assert(big._2 < 60L, s"5% sample kept ${big._2} of 200")
    assert(big._3 === big._2 * (big._2 - 1) / 2)
    // determinism: the same call selects the same rows
    val again = Robust.kendallSampledByKey(rows.toDF("k", "id", "x", "y"),
        "k", "id", "x", "y", rate = 0.05)
      .as[(String, Long, Long, Long, Long, Long, Long, Long,
        Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(again("big") === big._2)
    // a key whose rows are all sampled away keeps its n_full row
    val tiny = out("tiny")
    assert(tiny._1 === 1L && (tiny._2 === 0L || tiny._2 === 1L))
    if (tiny._2 === 0L) assert(tiny._8.isEmpty)
  }

  test("trimmedMeanAuto dispatches by largest-key size, results match") {
    val rows = (1 to 100).map(i => ("k", i.toLong, i.toDouble))
    val df = rows.toDF("k", "id", "v")
    val (exactDf, p1) = Robust.trimmedMeanAutoWithPath(
      df, "k", "v", "id", 0.1, maxExactKeyRows = 1000L)
    assert(p1 === "exact")
    val exp = trimmed(rows, 0.1)("k")
    val got = exactDf.as[(String, Long, Long, Option[Double])].head()
    assert((got._2, got._3, got._4) === exp)
    val (skDf, p2) = Robust.trimmedMeanAutoWithPath(
      df, "k", "v", "id", 0.1, maxExactKeyRows = 10L)
    assert(p2 === "sketch")
    val sk = skDf.as[(String, Long, Long, Option[Double])].head()
    val skDirect = Robust.trimmedMeanSketch(df, "k", "v", 0.1)
      .as[(String, Long, Long, Option[Double])].head()
    assert(sk === skDirect)
  }
}
