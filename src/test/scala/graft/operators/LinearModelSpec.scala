package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit, pmod}

class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  // y = 3 + 2*x1 - 5*x2, exact: OLS must recover the coefficients
  private def exactDf = Seq(
    ("a", 1.0, 0.0), ("a", 2.0, 1.0), ("a", 3.0, 0.5), ("a", 4.0, 1.5),
    ("a", 5.0, 0.25), ("a", 6.0, 2.0))
    .map { case (k, x1, x2) => (k, x1, x2, 3.0 + 2.0 * x1 - 5.0 * x2) }
    .toDF("k", "x1", "x2", "y")

  test("OLS recovers an exact linear relation (λ=0)") {
    val r = LinearModel.ridgeByKey(exactDf, "k", "y", "x1", "x2", 0.0)
      .collect()
    assert(r.length === 1)
    val Row(_, n: Long, b0: Double, b1: Double, b2: Double, r2: Double) = r(0)
    assert(n === 6L)
    assert(math.abs(b0 - 3.0) < 1e-9 && math.abs(b1 - 2.0) < 1e-9 &&
      math.abs(b2 + 5.0) < 1e-9)
    assert(math.abs(r2 - 1.0) < 1e-12)
  }

  test("ridge shrinks coefficients toward zero and r2 below the OLS fit") {
    val ols = LinearModel.ridgeByKey(exactDf, "k", "y", "x1", "x2", 0.0)
      .collect()(0)
    val rdg = LinearModel.ridgeByKey(exactDf, "k", "y", "x1", "x2", 50.0)
      .collect()(0)
    assert(math.abs(rdg.getDouble(3)) < math.abs(ols.getDouble(3)),
      "b1 must shrink under the penalty")
    assert(rdg.getDouble(5) < ols.getDouble(5), "penalised fit loses R²")
  }

  test("singular normal matrix (constant feature, λ=0) yields null coefficients") {
    val df = Seq(("a", 1.0, 7.0, 2.0), ("a", 2.0, 7.0, 4.0),
      ("a", 3.0, 7.0, 6.0)).toDF("k", "x1", "x2", "y")
    val r = LinearModel.ridgeByKey(df, "k", "y", "x1", "x2", 0.0).collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
    // ...and the same matrix becomes solvable once the ridge is on
    val r2 = LinearModel.ridgeByKey(df, "k", "y", "x1", "x2", 1.0).collect()(0)
    assert(!r2.isNullAt(2) && !r2.isNullAt(3))
  }

  test("general-d driver solve matches the d=2 closed form") {
    val closed = LinearModel.ridgeByKey(exactDf, "k", "y", "x1", "x2", 10.0)
      .collect()(0)
    val Some((coef, n)) =
      LinearModel.ridgeFit(exactDf, "y", Seq("x1", "x2"), 10.0)
    assert(n === 6L)
    assert(math.abs(coef(0) - closed.getDouble(2)) < 1e-9)
    assert(math.abs(coef(1) - closed.getDouble(3)) < 1e-9)
    assert(math.abs(coef(2) - closed.getDouble(4)) < 1e-9)
  }

  test("general-d handles d=3 (a feature the closed form can't take)") {
    val df = (1 to 20).map { i =>
      val (x1, x2, x3) = (i.toDouble, (i % 5).toDouble, (i % 3).toDouble)
      ("a", x1, x2, x3, 1.0 + 0.5 * x1 - 2.0 * x2 + 4.0 * x3)
    }.toDF("k", "x1", "x2", "x3", "y")
    val Some((coef, n)) =
      LinearModel.ridgeFit(df, "y", Seq("x1", "x2", "x3"), 0.0)
    assert(n === 20L)
    val want = Seq(1.0, 0.5, -2.0, 4.0)
    coef.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-8,
      s"got $coef want $want") }
  }

  test("CV: each fold's coefficients equal a direct fit on its complement") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 200).map { i =>
      val (x1, x2) = (rnd.nextInt(50) / 2.0, rnd.nextInt(20) / 4.0)
      (i % 4, x1, x2, 1.5 + 0.75 * x1 - 2.25 * x2 + rnd.nextInt(9) / 4.0)
    }.toDF("fold", "x1", "x2", "y")
    val cv = LinearModel.cvRidgeByFold(df, "fold", "y", "x1", "x2", 25.0)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(cv.size === 4)
    for (f <- 0 to 3) {
      val direct = LinearModel.ridgeByKey(
        df.filter(col("fold") =!= f).withColumn("k", lit("all")),
        "k", "y", "x1", "x2", 25.0).collect()(0)
      for ((ci, di) <- Seq(2 -> 2, 3 -> 3, 4 -> 4))
        assert(math.abs(cv(f).getDouble(ci) - direct.getDouble(di)) < 1e-9,
          s"fold $f coefficient $ci diverges from the complement fit")
    }
  }

  test("CV: out-of-fold SSE matches per-row residuals, and is ~0 on an exact relation") {
    val exactFolds = (1 to 40).map { i =>
      val (x1, x2) = (i.toDouble, (i % 7).toDouble)
      (i % 4, x1, x2, 3.0 + 2.0 * x1 - 5.0 * x2)
    }.toDF("fold", "x1", "x2", "y")
    val cvExact = LinearModel
      .cvRidgeByFold(exactFolds, "fold", "y", "x1", "x2", 0.0).collect()
    cvExact.foreach(r => assert(math.abs(r.getDouble(5)) < 1e-6,
      s"exact relation must have ~0 OOF error, got ${r.getDouble(5)}"))
    // noisy data: quadratic-form SSE == explicit per-row residual sum
    val rnd = new scala.util.Random(3)
    val rows = (1 to 120).map { i =>
      val (x1, x2) = (rnd.nextInt(30) / 2.0, rnd.nextInt(10) / 2.0)
      (i % 3, x1, x2, 1.0 + x1 - 2.0 * x2 + rnd.nextInt(5) / 2.0)
    }
    val df = rows.toDF("fold", "x1", "x2", "y")
    val cv = LinearModel.cvRidgeByFold(df, "fold", "y", "x1", "x2", 0.0)
      .collect().map(r => r.getInt(0) -> r).toMap
    for (f <- 0 to 2) {
      val r = cv(f)
      val (b0, b1, b2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val explicit = rows.filter(_._1 == f)
        .map { case (_, x1, x2, y) =>
          val e = y - (b0 + b1 * x1 + b2 * x2); e * e }.sum
      assert(math.abs(r.getDouble(5) - explicit) < 1e-6,
        s"fold $f: quadratic-form SSE ${r.getDouble(5)} vs explicit $explicit")
      assert(math.abs(r.getDouble(6) -
        math.sqrt(explicit / rows.count(_._1 == f))) < 1e-9)
    }
  }

  test("moment state: batch-merged fit is bit-equal to the full-corpus fit") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map { i =>
      (s"k${i % 2}", rnd.nextInt(40) / 2.0, rnd.nextInt(12) / 4.0,
        2.0 + 0.5 * rnd.nextInt(40) - rnd.nextInt(8) / 2.0)
    }
    val df = rows.toDF("k", "x1", "x2", "y")
    val full = LinearModel.ridgeByKey(df, "k", "y", "x1", "x2", 10.0)
      .collect().map(r => r.getString(0) -> r).toMap
    // three disjoint batches folded as state, then solved from state
    val states = Seq(0, 1, 2).map(b => LinearModel.momentState(
      df.filter(pmod(col("x1") * 2, lit(3)) === b), "k", "y", "x1", "x2"))
    val merged = LinearModel.mergeMomentState(
      states.reduce(_ unionByName _), "k")
    val fromState = LinearModel.ridgeFromState(merged, "k", 10.0)
      .collect().map(r => r.getString(0) -> r).toMap
    for (k <- Seq("k0", "k1"); i <- 2 to 5)
      assert(fromState(k).getDouble(i) === full(k).getDouble(i),
        s"state fit must be BIT-equal ($k col $i)")
    // merge is associative-stable: re-merging the merged state is a no-op
    val again = LinearModel.mergeMomentState(merged, "k")
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again === merged.collect().map(r => r.getString(0) -> r.toSeq).toMap)
  }

  test("logistic: distributed IRLS equals an independent single-threaded replay") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { _ =>
      val (x1, x2) = (rnd.nextGaussian(), rnd.nextGaussian())
      val p = 1.0 / (1.0 + math.exp(-(-0.5 + 1.5 * x1 - 1.0 * x2)))
      (x1, x2, if (rnd.nextDouble() < p) 1.0 else 0.0)
    }
    val df = rows.toDF("x1", "x2", "y")
    val Some(got) = LinearModel.logisticFit(df, "y", Seq("x1", "x2"),
      iters = 6, ridge = 1e-6)

    // independent replay: plain loops, same Newton recipe
    var beta = Array(0.0, 0.0, 0.0)
    for (_ <- 1 to 6) {
      val h = Array.ofDim[Double](3, 3); val g = Array.ofDim[Double](3)
      for ((x1, x2, y) <- rows) {
        val xs = Array(1.0, x1, x2)
        val p = 1.0 / (1.0 + math.exp(-(xs, beta).zipped.map(_ * _).sum))
        val w = p * (1.0 - p)
        for (r <- 0 until 3; c <- 0 until 3) h(r)(c) += w * xs(r) * xs(c)
        for (r <- 0 until 3) g(r) += (y - p) * xs(r)
      }
      for (r <- 0 until 3) h(r)(r) += 1e-6
      val Some(delta) = LinearModel.solveInPlace(h, g)
      beta = beta.zip(delta).map { case (b, d) => b + d }
    }
    got.zip(beta).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"got $got want ${beta.toSeq}") }
    // and the recovered coefficients are near the generating truth
    val want = Seq(-0.5, 1.5, -1.0)
    got.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 0.4,
      s"fit $got too far from truth $want") }
  }

  test("logistic: scores rank a separable corpus perfectly (AUC = 1)") {
    val df = ((1 to 50).map(i => (i / 100.0 + 1.0, 1.0)) ++
      (1 to 50).map(i => (-i / 100.0 - 1.0, 0.0))).toDF("x1", "y")
    val Some(beta) = LinearModel.logisticFit(df, "y", Seq("x1"),
      iters = 5, ridge = 0.1) // separable: ridge keeps H invertible
    val scored = LinearModel.logisticScore(
      df.withColumn("k", lit("g")), beta, Seq("x1"), "s")
      .withColumn("l", col("y").cast("long"))
    val auc = Auc.aucByKey(scored, "k", "s", "l").collect()(0)
    assert(auc.getLong(3) === 1000000L)
  }

  test("null rows are dropped listwise; score appends predictions") {
    val df = Seq(("a", Some(1.0), Some(0.0), Some(5.0)),
      ("a", Some(2.0), Some(1.0), Some(2.0)),
      ("a", None, Some(1.0), Some(9.0)),
      ("a", Some(3.0), Some(0.5), Some(6.5)),
      ("a", Some(4.0), Some(1.5), Some(3.5)))
      .toDF("k", "x1", "x2", "y")
    val fit = LinearModel.ridgeByKey(df, "k", "y", "x1", "x2", 0.0)
    assert(fit.collect()(0).getLong(1) === 4L)
    val scored = LinearModel.score(df, fit, "k", "x1", "x2", "pred")
    assert(scored.columns.contains("pred"))
    assert(scored.count() === 5L) // scoring keeps every row, even null-x
  }
}
