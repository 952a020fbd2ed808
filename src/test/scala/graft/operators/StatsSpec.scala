package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("perfect positive and negative correlation") {
    val df = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      ("b", 1.0, 3.0), ("b", 2.0, 2.0), ("b", 3.0, 1.0)
    ).toDF("k", "x", "y")
    val out = Stats.corrByKey(df, "k", "x", "y")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(out("a").get - 1.0) < 1e-12)
    assert(math.abs(out("b").get - (-1.0)) < 1e-12)
  }

  test("corrMatrix agrees with corrByKey on every pair") {
    val df = Seq(
      (1.0, 2.0, 9.0), (2.0, 4.5, 7.0), (3.0, 5.5, 5.0),
      (4.0, 9.0, 2.0), (5.0, 9.5, 1.0)
    ).toDF("x", "y", "z")
    val m = Stats.corrMatrix(df, Seq("x", "y", "z"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m.keySet === Set(("x", "y"), ("x", "z"), ("y", "z")))
    Seq(("x", "y"), ("x", "z"), ("y", "z")).foreach { case (a, b) =>
      val single = Stats.corrByKey(df.withColumn("k", lit("g")),
        "k", a, b).as[(String, Long, Option[Double])].head()
      assert(m((a, b))._1 === single._2)
      assert(math.abs(m((a, b))._2.get - single._3.get) < 1e-12,
        s"pair ($a,$b)")
    }
    // pairwise-complete: a null in z must not shrink the (x,y) pair
    val withNull = df.union(Seq((6.0, 11.0, Double.NaN)).toDF)
      .withColumn("z", when(col("z").isNaN, lit(null)).otherwise(col("z")))
    val m2 = Stats.corrMatrix(withNull, Seq("x", "y", "z"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(m2(("x", "y")) === 6L && m2(("x", "z")) === 5L)
  }

  test("nulls are pairwise-complete dropped, not counted into n") {
    // (1,1),(2,2) complete; (null,5) must not poison the moments.
    val df = Seq(
      ("a", Some(1.0), Some(1.0)), ("a", Some(2.0), Some(2.0)),
      ("a", Option.empty[Double], Some(5.0))
    ).toDF("k", "x", "y")
    val (n, corr) = Stats.corrByKey(df, "k", "x", "y")
      .as[(String, Long, Option[Double])].collect()
      .map(r => (r._2, r._3)).head
    assert(n == 2L)
    assert(math.abs(corr.get - 1.0) < 1e-12)
    val t = Stats.trendByKey(df, "k", "x", "y")
      .as[(String, Long, Option[Double], Option[Double])].collect().head
    assert(t._2 == 2L && math.abs(t._3.get - 1.0) < 1e-12)
  }

  test("chi-square excludes null categories from cells AND margins") {
    val rows = Seq(
      (Some("x"), Some("p")), (Some("x"), Some("q")),
      (Some("y"), Some("p")), (Some("y"), Some("q")),
      (Some("x"), None), (None, Some("p")) // must not inflate margins
    ).toDF("a", "b")
    val out = Stats.chiSquareCells(rows, "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
    assert(out.length == 4)
    // 2x2 of ones: margins 2/2, N=4, expected 1, contrib 0 — only true
    // if the null-category rows were excluded from the totals.
    out.foreach { case (_, _, obs, exp, contrib) =>
      assert(obs == 1L && exp == 1.0 && contrib == 0.0)
    }
  }

  test("zero variance yields null correlation") {
    val df = Seq(("a", 5.0, 1.0), ("a", 5.0, 2.0)).toDF("k", "x", "y")
    val out = Stats.corrByKey(df, "k", "x", "y")
      .as[(String, Long, Option[Double])].collect().head
    assert(out._3.isEmpty)
  }

  test("trend recovers an exact linear relationship") {
    // y = 3x + 10 per key
    val df = (1 to 5).map(i => ("a", i.toDouble, 3.0 * i + 10.0))
      .toDF("k", "x", "y")
    val (_, n, slope, icept) = Stats.trendByKey(df, "k", "x", "y")
      .as[(String, Long, Option[Double], Option[Double])].collect().head
    assert(n == 5L)
    assert(math.abs(slope.get - 3.0) < 1e-12)
    assert(math.abs(icept.get - 10.0) < 1e-12)
    // constant x -> null slope
    val flat = Seq(("b", 2.0, 1.0), ("b", 2.0, 5.0)).toDF("k", "x", "y")
    val r = Stats.trendByKey(flat, "k", "x", "y")
      .as[(String, Long, Option[Double], Option[Double])].collect().head
    assert(r._3.isEmpty && r._4.isEmpty)
  }

  test("chi-square cells: independent margins give zero contribution") {
    // 2x2 perfectly independent: obs = row*col/N exactly
    val rows = Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(4)(("y", "p")) ++ Seq.fill(4)(("y", "q"))
    val out = Stats.chiSquareCells(rows.toDF("a", "b"), "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
    assert(out.length == 4)
    out.foreach { case (_, _, obs, exp, contrib) =>
      assert(obs == 4L && exp == 4.0 && contrib == 0.0)
    }
  }

  test("chi-square cells: known dependent table") {
    // [[3,1],[1,3]]: N=8, margins all 4, expected all 2, contrib (±1)²/2
    val rows = Seq.fill(3)(("x", "p")) ++ Seq.fill(1)(("x", "q")) ++
      Seq.fill(1)(("y", "p")) ++ Seq.fill(3)(("y", "q"))
    val out = Stats.chiSquareCells(rows.toDF("a", "b"), "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("x", "p")) == ((3L, 2.0, 0.5)))
    assert(out(("x", "q")) == ((1L, 2.0, 0.5)))
    assert(out(("y", "p")) == ((1L, 2.0, 0.5)))
    assert(out(("y", "q")) == ((3L, 2.0, 0.5)))
  }

  test("welch: hand-computed t and df on a known pair of samples") {
    // a = {1,2,3,4}: mean 2.5, var 5/3; b = {10,12}: mean 11, var 2.
    // se2 = 5/12 + 1 ; t = -8.5/sqrt(17/12)
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 12.0)).map { case (g, v) => ("k", g, v) }
    val r = Stats.welchByKey(rows.toDF("key", "g", "v"),
      "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(r._2 == 4L && r._3 == 2L)
    assert(r._4.contains(2.5) && r._5.contains(11.0))
    val se2 = 5.0 / 3.0 / 4.0 + 2.0 / 2.0
    assert(math.abs(r._6.get - (2.5 - 11.0) / math.sqrt(se2)) < 1e-12)
    val dfW = se2 * se2 /
      ((5.0 / 3.0 / 4.0) * (5.0 / 3.0 / 4.0) / 3.0 + 1.0 / 1.0)
    assert(math.abs(r._7.get - dfW) < 1e-12)
  }

  test("welch: identical groups give t = 0; tiny groups gate to null") {
    val same = Seq(("k", "a", 1.0), ("k", "a", 3.0),
      ("k", "b", 1.0), ("k", "b", 3.0))
    val r1 = Stats.welchByKey(same.toDF("key", "g", "v"),
      "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(r1._6.contains(0.0))
    // n_b = 1 -> no variance -> t/df null, means still reported
    val tiny = Seq(("k", "a", 1.0), ("k", "a", 2.0), ("k", "b", 5.0))
    val r2 = Stats.welchByKey(tiny.toDF("key", "g", "v"),
      "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(r2._2 == 2L && r2._3 == 1L)
    assert(r2._5.contains(5.0) && r2._6.isEmpty && r2._7.isEmpty)
  }

  test("welch: zero-variance both sides gates on se2 > 0, not n") {
    val rows = Seq(("k", "a", 4.0), ("k", "a", 4.0),
      ("k", "b", 9.0), ("k", "b", 9.0))
    val r = Stats.welchByKey(rows.toDF("key", "g", "v"),
      "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(r._4.contains(4.0) && r._5.contains(9.0) && r._6.isEmpty)
  }

  test("ks: identical samples give 0, disjoint samples give 1") {
    val same = (1 to 10).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("g", "v")
    val ks0 = Stats.ksStatistic(same, "g", "a", "b", "v")
      .select("ks").as[Double].collect().head
    assert(ks0 == 0.0)
    val disjoint = ((1 to 5).map(i => ("a", i.toDouble)) ++
      (11 to 15).map(i => ("b", i.toDouble))).toDF("g", "v")
    val ks1 = Stats.ksStatistic(disjoint, "g", "a", "b", "v")
      .select("ks").as[Double].collect().head
    assert(ks1 == 1.0)
  }

  test("ks: hand-computed on a small shifted sample") {
    // a = {1,2,3,4}, b = {3,4,5,6}: sup |Fa - Fb| at v=2 is 0.5
    val rows = (Seq(1, 2, 3, 4).map(i => ("a", i.toDouble)) ++
      Seq(3, 4, 5, 6).map(i => ("b", i.toDouble))).toDF("g", "v")
    val r = Stats.ksStatistic(rows, "g", "a", "b", "v")
      .as[(Long, Long, Double)].collect().head
    assert(r == ((4L, 4L, 0.5)))
  }

  test("gini: equality gives 0, single-holder concentration approaches 1") {
    val equal = (1 to 10).map(i => ("k", i.toLong, 5L)).toDF("g", "id", "v")
    val g0 = Stats.giniByKey(equal, "g", "v", "id")
      .select("gini").as[Option[Double]].collect().head
    assert(g0.contains(0.0))
    // one holder of everything among n=10: G = (n-1)/n = 0.9 in reals;
    // the assertion mirrors the fixed double shape (2.0 - 11/10 is one
    // ulp below 0.9 — the same value any engine computing the shape gets)
    val conc = ((1 to 9).map(i => ("k", i.toLong, 0L)) :+ ("k", 10L, 100L))
      .toDF("g", "id", "v")
    val g1 = Stats.giniByKey(conc, "g", "v", "id")
      .select("gini").as[Option[Double]].collect().head
    assert(g1.contains(2000.0 / (10.0 * 100.0) - 11.0 / 10.0))
  }

  test("gini: tie order cannot change the statistic; degenerate keys null") {
    val ties = Seq(("k", 1L, 3L), ("k", 2L, 3L), ("k", 3L, 9L))
    val a = Stats.giniByKey(ties.toDF("g", "id", "v"), "g", "v", "id")
      .select("gini").as[Option[Double]].collect().head
    val b = Stats.giniByKey(ties.reverse.toDF("g", "id", "v")
      .repartition(3), "g", "v", "id")
      .select("gini").as[Option[Double]].collect().head
    assert(a == b && a.nonEmpty)
    val single = Seq(("k", 1L, 7L)).toDF("g", "id", "v")
    assert(Stats.giniByKey(single, "g", "v", "id")
      .select("gini").as[Option[Double]].collect().head.isEmpty)
    val zeros = Seq(("k", 1L, 0L), ("k", 2L, 0L)).toDF("g", "id", "v")
    assert(Stats.giniByKey(zeros, "g", "v", "id")
      .select("gini").as[Option[Double]].collect().head.isEmpty)
  }

  test("mann-whitney: hand-computed U on a clean separation and a tie") {
    // A = {1,2}, B = {3,4}: every B beats every A -> U_a = 0.
    val clean = Seq(("k", "a", 1.0), ("k", "a", 2.0),
      ("k", "b", 3.0), ("k", "b", 4.0)).toDF("key", "g", "v")
    val r = Stats.mannWhitneyByKey(clean, "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(r._2 == 2 && r._3 == 2)
    assert(r._4.contains(0.0))
    assert(r._5.get < 0) // a stochastically below b
    // A = {1,2}, B = {2,3}: the shared 2 contributes a half pair ->
    // U_a = #(a<b pairs) + 0.5*#(ties) = 1 + 1 + 0.5 = 2.5? count:
    // (1<2),(1<3),(2<3)=3 wins, (2==2)=0.5 -> U_b(a perspective)...
    // U_a counts pairs where a < b plus half ties: 3 + 0.5 = wrong
    // direction; U_a = R_a - n(n+1)/2 with ranks 1, 2.5 | 2.5, 4:
    // R_a = 3.5 -> U_a = 0.5.
    val tied = Seq(("k", "a", 1.0), ("k", "a", 2.0),
      ("k", "b", 2.0), ("k", "b", 3.0)).toDF("key", "g", "v")
    val rt = Stats.mannWhitneyByKey(tied, "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(rt._4.contains(0.5))
    // identical singletons: sigma2 = 0 (all values tie) -> z null
    val deg = Seq(("k", "a", 5.0), ("k", "b", 5.0)).toDF("key", "g", "v")
    assert(Stats.mannWhitneyByKey(deg, "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().head._5.isEmpty)
  }

  test("mann-whitney: partitioning cannot change U or z") {
    val rows = (1 to 60).map(i =>
      ("k", if (i % 2 == 0) "a" else "b", (i % 7).toDouble))
    val one = Stats.mannWhitneyByKey(rows.toDF("key", "g", "v"),
      "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().head
    val many = Stats.mannWhitneyByKey(
      rows.reverse.toDF("key", "g", "v").repartition(7),
      "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(one == many)
  }

  test("spearman: monotone nonlinear is exactly 1, reversed -1, " +
    "and ties use mid-ranks") {
    val mono = Seq(("k", 1.0, 1.0), ("k", 2.0, 8.0), ("k", 3.0, 27.0),
      ("k", 4.0, 64.0)).toDF("key", "x", "y")
    val rho = Stats.spearmanByKey(mono, "key", "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3
    assert(math.abs(rho.get - 1.0) < 1e-12)
    val rev = Stats.spearmanByKey(
      mono.withColumn("y", org.apache.spark.sql.functions.negate(
        org.apache.spark.sql.functions.col("y"))), "key", "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3
    assert(math.abs(rev.get + 1.0) < 1e-12)
    // x = (1, 2, 2, 3) -> mid-ranks (1, 2.5, 2.5, 4); against
    // y = (1, 2, 3, 4): scipy gives rho = 0.9486832980505138
    val tied = Seq(("k", 1.0, 1.0), ("k", 2.0, 2.0), ("k", 2.0, 3.0),
      ("k", 3.0, 4.0)).toDF("key", "x", "y")
    val rt = Stats.spearmanByKey(tied, "key", "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3
    assert(math.abs(rt.get - 0.9486832980505138) < 1e-12)
  }

  test("welch: other groups and null values are excluded") {
    val rows = Seq(("k", "a", Some(1.0)), ("k", "a", Some(3.0)),
      ("k", "a", None), ("k", "c", Some(100.0)),
      ("k", "b", Some(2.0)), ("k", "b", Some(4.0)))
    val r = Stats.welchByKey(rows.toDF("key", "g", "v"),
      "key", "g", "a", "b", "v")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(r._2 == 2L && r._3 == 2L)
    assert(r._4.contains(2.0) && r._5.contains(3.0))
  }

  private def bh(ps: Seq[(String, Double)], alpha: Double) =
    Stats.bhAdjust(ps.toDF("test", "p"), "test", "p", alpha)
      .select("test", "p", "rank", "p_adj", "reject")
      .as[(String, Double, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap

  test("cohenKappa: textbook 2x2 agreement table") {
    // (yes,yes)=20 (yes,no)=5 (no,yes)=10 (no,no)=15 -> n=50, po=0.7,
    // margins A 25/25, B 30/20 -> pe_num=25*30+25*20=1250, pe=0.5,
    // kappa = (0.7-0.5)/(1-0.5) = 0.4
    val rows =
      Seq.fill(20)(("k", "yes", "yes")) ++ Seq.fill(5)(("k", "yes", "no")) ++
      Seq.fill(10)(("k", "no", "yes")) ++ Seq.fill(15)(("k", "no", "no"))
    val out = Stats.cohenKappa(rows.toDF("k", "a", "b"), "k", "a", "b")
      .as[(String, Long, Long, Long, Double, Double, Option[Double])]
      .head()
    assert(out.copy(_7 = None) === (("k", 50L, 35L, 1250L, 0.7, 0.5, None)))
    assert(math.abs(out._7.get - 0.4) < 1e-15)
  }

  test("cohenKappa: a category used by only one rater adds no pe term") {
    // A uses {a,b}, B uses {a,c}: only 'a' is shared -> pe_num = 2*2
    val rows = Seq(("k", "a", "a"), ("k", "a", "a"),
      ("k", "b", "c"), ("k", "b", "c"))
    val out = Stats.cohenKappa(rows.toDF("k", "a", "b"), "k", "a", "b")
      .as[(String, Long, Long, Long, Double, Double, Option[Double])]
      .head()
    assert(out._4 === 4L && out._5 === 0.5 && out._6 === 0.25)
    assert(math.abs(out._7.get - (0.25 / 0.75)) < 1e-15)
  }

  test("cohenKappa: full agreement on a single category is degenerate") {
    // pe = 1 -> kappa undefined (null), not +inf or NaN
    val rows = Seq(("k", "x", "x"), ("k", "x", "x"))
    val out = Stats.cohenKappa(rows.toDF("k", "a", "b"), "k", "a", "b")
      .as[(String, Long, Long, Long, Double, Double, Option[Double])]
      .head()
    assert(out._5 === 1.0 && out._6 === 1.0 && out._7.isEmpty)
  }

  test("rollingTrend: exact slopes over a trailing frame") {
    // y = 2x: every full frame has slope exactly 2; short frames null
    val rows = (1 to 6).map(i => ("k", i.toLong, i.toDouble, 2.0 * i))
    val out = Stats.rollingTrend(rows.toDF("k", "t", "x", "y"),
        "k", "t", "x", "y", window = 3, minRows = 3)
      .select("t", "n_win", "slope")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((1L, None)) && out(2L) === ((2L, None)))
    (3L to 6L).foreach(t => assert(out(t) === ((3L, Some(2.0))), s"t=$t"))
  }

  test("rollingTrend: the window is trailing — a level shift fades out") {
    // y jumps at t=4; slope at t=6 sees only the flat tail
    val ys = Seq(0.0, 0.0, 0.0, 10.0, 10.0, 10.0)
    val rows = ys.zipWithIndex.map { case (y, i) =>
      ("k", (i + 1).toLong, (i + 1).toDouble, y) }
    val out = Stats.rollingTrend(rows.toDF("k", "t", "x", "y"),
        "k", "t", "x", "y", window = 3, minRows = 3)
      .select("t", "slope").as[(Long, Option[Double])].collect().toMap
    assert(out(3L) === Some(0.0) && out(6L) === Some(0.0))
    assert(out(4L).get > 0.0 && out(5L).get > 0.0)
  }

  test("rollingTrend: a null pair inside the frame is invisible to the fit") {
    // t=1..4 on y = 2x, but t=3 has a null y: the t=4 frame (window 3)
    // holds rows t=2..4 with only TWO complete pairs -> n_win = 2,
    // below minRows=3 -> null slope (not a silently-wrong one); the
    // t=5 frame (t=3..5) has 2 complete pairs too.
    val rows = Seq(
      ("k", 1L, Some(1.0), Some(2.0)), ("k", 2L, Some(2.0), Some(4.0)),
      ("k", 3L, Some(3.0), None), ("k", 4L, Some(4.0), Some(8.0)),
      ("k", 5L, Some(5.0), Some(10.0)))
    val out = Stats.rollingTrend(rows.toDF("k", "t", "x", "y"),
        "k", "t", "x", "y", window = 3, minRows = 3)
      .select("t", "n_win", "slope")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(3L) === ((2L, None))) // frame t=1..3, pair t=3 missing
    assert(out(4L) === ((2L, None))) // frame t=2..4
    assert(out(5L) === ((2L, None))) // frame t=3..5
    // with minRows=2 the two complete pairs fit exactly: slope 2
    val loose = Stats.rollingTrend(rows.toDF("k", "t", "x", "y"),
        "k", "t", "x", "y", window = 3, minRows = 2)
      .select("t", "slope").as[(Long, Option[Double])].collect().toMap
    assert(loose(4L) === Some(2.0) && loose(5L) === Some(2.0))
  }

  test("cramersV: high-cardinality input fails fast, not an OOM") {
    val rows = (1 to 9).map(i => (s"a$i", s"b$i"))
    val ex = intercept[IllegalArgumentException] {
      Stats.cramersV(rows.toDF("a", "b"), "a", "b", maxCells = 4).collect()
    }
    assert(ex.getMessage.contains("bounded-collect contract"))
    // at or under the cap the statistic still computes
    assert(Stats.cramersV(rows.toDF("a", "b"), "a", "b", maxCells = 9)
      .count() === 1L)
  }

  test("mcnemar: hand-computed discordant cells") {
    // pairs: (1,0)x6, (0,1)x2, (1,1)x5, (0,0)x3 -> b=6 c=2
    // chi2 = 16/8 = 2.0
    val rows = Seq.fill(6)(("k", 1L, 0L)) ++ Seq.fill(2)(("k", 0L, 1L)) ++
      Seq.fill(5)(("k", 1L, 1L)) ++ Seq.fill(3)(("k", 0L, 0L))
    val out = Stats.mcnemar(rows.toDF("k", "a", "b"), "k", "a", "b")
      .as[(String, Long, Long, Long, Option[Double])].head()
    assert(out === (("k", 16L, 6L, 2L, Some(2.0))))
  }

  test("mcnemar: no discordance gives null chi2, not 0/0") {
    val rows = Seq(("k", 1L, 1L), ("k", 0L, 0L))
    val out = Stats.mcnemar(rows.toDF("k", "a", "b"), "k", "a", "b")
      .as[(String, Long, Long, Long, Option[Double])].head()
    assert(out === (("k", 2L, 0L, 0L, None)))
  }

  test("fleissKappa: hand-computed two-subject panel") {
    // S1: aaa (sq 9), S2: abb (sq 5) -> A=14, N=2, r=3, Nr=6
    // P_bar = (14-6)/(6*2) = 2/3; c_a=4, c_b=2 -> B=20, P_e = 20/36
    // kappa = (2/3 - 5/9)/(1 - 5/9) = 0.25
    val rows = Seq(("k", 1L, "a"), ("k", 1L, "a"), ("k", 1L, "a"),
      ("k", 2L, "a"), ("k", 2L, "b"), ("k", 2L, "b"))
    val out = Stats.fleissKappa(rows.toDF("k", "s", "c"), "k", "s", "c", 3)
      .as[(String, Long, Long, Long, Double, Double, Double,
        Option[Double])].head()
    assert((out._2, out._3, out._4, out._5) === ((2L, 0L, 14L, 20.0)))
    assert(math.abs(out._6 - 2.0 / 3.0) < 1e-15)
    assert(math.abs(out._7 - 5.0 / 9.0) < 1e-15)
    assert(math.abs(out._8.get - 0.25) < 1e-15)
  }

  test("fleissKappa: wrong-count subjects are excluded from ALL moments") {
    // S3 has only 2 ratings: must not enter A, B, or n_subjects
    val rows = Seq(("k", 1L, "a"), ("k", 1L, "a"), ("k", 1L, "a"),
      ("k", 2L, "a"), ("k", 2L, "b"), ("k", 2L, "b"),
      ("k", 3L, "b"), ("k", 3L, "b"))
    val out = Stats.fleissKappa(rows.toDF("k", "s", "c"), "k", "s", "c", 3)
      .as[(String, Long, Long, Long, Double, Double, Double,
        Option[Double])].head()
    assert((out._2, out._3, out._4, out._5) === ((2L, 1L, 14L, 20.0)))
  }

  test("fleissKappa: unanimous raters on one category is degenerate") {
    // every rating identical -> P_e = 1 -> null kappa
    val rows = Seq.fill(3)(("k", 1L, "x")) ++ Seq.fill(3)(("k", 2L, "x"))
    val out = Stats.fleissKappa(rows.toDF("k", "s", "c"), "k", "s", "c", 3)
      .as[(String, Long, Long, Long, Double, Double, Double,
        Option[Double])].head()
    assert(out._7 === 1.0 && out._8.isEmpty)
  }

  test("mantelHaenszel: hand-computed pooled odds over two strata") {
    // s1: a=4 b=1 c=2 d=3 n=10 -> ad 1200000, bc 200000 (micro)
    // s2: a=1 b=3 c=3 d=9 n=16 -> ad 562500, bc 562500
    def cells(st: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((st, 1L, 1L)) ++ Seq.fill(b)((st, 1L, 0L)) ++
      Seq.fill(c)((st, 0L, 1L)) ++ Seq.fill(d)((st, 0L, 0L))
    val rows = cells("s1", 4, 1, 2, 3) ++ cells("s2", 1, 3, 3, 9)
    val out = Stats.mantelHaenszel(rows.toDF("st", "e", "o"), "st", "e", "o")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(out._1 === 2L && out._2 === 26L)
    assert(out._3 === 1762500L && out._4 === 762500L)
    assert(out._5 === Some(1762500.0 / 762500.0))
  }

  test("mantelHaenszel: zero denominator sum gives null, not infinity") {
    // no (exposed, no-outcome) and no (unexposed, outcome) cells
    val rows = Seq(("s", 1L, 1L), ("s", 1L, 1L), ("s", 0L, 0L))
    val out = Stats.mantelHaenszel(rows.toDF("st", "e", "o"), "st", "e", "o")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(out._4 === 0L && out._5.isEmpty)
  }

  test("cramersV: perfect 2x2 association is V = 1 (zero cells counted)") {
    // only (a,x) and (b,y) observed; the two unobserved cells carry
    // E = 5 each -> chi2 = 20 = n, V = sqrt(20/(20*1)) = 1
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val out = Stats.cramersV(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(out === ((20L, 2L, 2L, 20000000L, Some(1.0))))
  }

  test("cramersV: independence gives chi2 = 0, V = 0") {
    val rows = for { a <- Seq("a", "b"); b <- Seq("x", "y"); _ <- 1 to 5 }
      yield (a, b)
    val out = Stats.cramersV(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(out._4 === 0L && out._5 === Some(0.0))
  }

  test("cramersV: single-column table is degenerate (null V)") {
    val rows = Seq(("a", "x"), ("b", "x"), ("a", "x"))
    val out = Stats.cramersV(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(out._3 === 1L && out._5.isEmpty)
  }

  test("bhAdjust: hand-computed adjusted p-values and rejections") {
    val out = bh(Seq("a" -> 0.005, "b" -> 0.011, "c" -> 0.02,
      "d" -> 0.8), 0.05)
    // raw_i = 4*p/i = 0.02, 0.022, 0.0266…, 0.8; suffix mins keep them.
    assert(out("a") == (("a", 0.005, 1L, 4.0 * 0.005 / 1.0, true)))
    assert(out("b") == (("b", 0.011, 2L, 4.0 * 0.011 / 2.0, true)))
    assert(out("c") == (("c", 0.02, 3L, 4.0 * 0.02 / 3.0, true)))
    assert(out("d") == (("d", 0.8, 4L, 0.8, false)))
  }

  test("bhAdjust: suffix min enforces step-up monotonicity") {
    // raw = (1.2, 0.7): rank 1's adjusted p is pulled DOWN to 0.7.
    val out = bh(Seq("x" -> 0.6, "y" -> 0.7), 0.05)
    assert(out("x")._4 == 0.7 && out("y")._4 == 0.7)
    assert(!out("x")._5 && !out("y")._5)
  }

  test("bhAdjust: tied p-values get identical adjusted values") {
    val out = bh(Seq("a" -> 0.02, "b" -> 0.02), 0.05)
    // tie ranks deterministically by test id; suffix min equalizes.
    assert(out("a")._3 == 1L && out("b")._3 == 2L)
    assert(out("a")._4 == 0.02 && out("b")._4 == 0.02)
    assert(out("a")._5 && out("b")._5)
  }

  test("bhAdjust: the largest rank's adjusted p is its own p") {
    val out = bh(Seq("a" -> 0.1, "b" -> 0.5, "c" -> 1.0), 0.05)
    assert(out("c")._4 == 1.0 && !out("c")._5)
  }
}
