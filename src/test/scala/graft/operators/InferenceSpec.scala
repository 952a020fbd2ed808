package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class InferenceSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, eps: Double = 1e-9) =
    assert(math.abs(a - b) < eps, s"$a vs $b")

  test("kruskalWallis matches the textbook tie-free example") {
    // scipy.stats.kruskal([1,2,3],[4,5,6],[7,8,9]) = 7.2
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)) ++
      Seq(7, 8, 9).map(("c", _)))
      .map { case (g, v) => ("k", g, v.toDouble) }.toDF("key", "g", "v")
    val r = Inference.kruskalWallisByKey(df, "key", "g", "v")
      .select("n_groups", "n", "h", "h_adj").head()
    assert(r.getLong(0) === 3 && r.getLong(1) === 9)
    // micro-quantized: within 1e-6·terms of the real-valued statistic
    approx(r.getDouble(2), 7.2, 1e-4)
    approx(r.getDouble(3), 7.2, 1e-4) // no ties → correction is 1
  }

  test("kruskalWallis tie correction matches the hand-worked tied sample") {
    // pooled 1,1,2,2,2,3: midranks 1.5,1.5,4,4,4,6 → R_a = 7, R_b = 14
    // H = 12/(6·7)·(49/3 + 196/3) − 21 = 7/3; Σ(t³−t) = 6 + 24 = 30
    // H' = (7/3) / (1 − 30/210) = 49/18 = 2.7222…
    val df = (Seq(1, 1, 2).map(("a", _)) ++ Seq(2, 2, 3).map(("b", _)))
      .map { case (g, v) => ("k", g, v.toDouble) }.toDF("key", "g", "v")
    val r = Inference.kruskalWallisByKey(df, "key", "g", "v")
      .select("h_adj").head()
    approx(r.getDouble(0), 49.0 / 18.0, 1e-4)
  }

  test("brownForsythe matches the hand-worked median-centered Levene") {
    // a = [1,2,3,4,10], median 3 → z = [2,1,0,1,7], z̄_a = 2.2
    // b = [2,2,2,2,2.5], median 2 → z = [0,0,0,0,0.5], z̄_b = 0.1
    // SSB = 5·(2.2−1.15)² + 5·(0.1−1.15)² = 11.025; SSW = 30.8 + 0.2
    // W = (8/1)·11.025/31 = 88.2/31 = 2.845161…
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 10.0).map(("a", _)) ++
      Seq(2.0, 2.0, 2.0, 2.0, 2.5).map(("b", _)))
      .map { case (g, v) => ("k", g, v) }.toDF("key", "g", "v")
    val r = Inference.brownForsytheByKey(df, "key", "g", "v")
      .select("n_groups", "n", "w").head()
    assert(r.getLong(0) === 2 && r.getLong(1) === 10)
    approx(r.getDouble(2), 88.2 / 31.0, 1e-4)
  }

  test("cochranQ matches the hand-worked 3-treatment example") {
    // subjects × (t1,t2,t3); C = (3,1,2), T = 6, R = (2,1,3,0) ⇒ ΣR² = 14
    //   Q = 2·(3·(9+1+4) − 36) / (3·6 − 14) = 12/4 = 3
    val df = Seq(
      (1L, 1L, 0L, 1L), (2L, 1L, 0L, 0L),
      (3L, 1L, 1L, 1L), (4L, 0L, 0L, 0L))
      .toDF("id", "t1", "t2", "t3")
    val r = Inference.cochranQ(df, Seq("t1", "t2", "t3")).head()
    assert(r.getLong(0) === 4 && r.getLong(1) === 6)
    approx(r.getDouble(2), 3.0)
  }

  test("cochranQ is null when all subjects agree across treatments") {
    val df = Seq((1L, 1L, 1L), (2L, 0L, 0L)).toDF("id", "t1", "t2")
    val r = Inference.cochranQ(df, Seq("t1", "t2")).head()
    assert(r.isNullAt(2)) // denominator k·T − ΣR² = 0
  }

  test("cronbachAlpha matches the two-item Spearman-Brown identity") {
    // For k=2, alpha = 2·cov/(var1+var2+2·cov). Items x and x+noise:
    val rows = Seq((1.0, 2.0), (2.0, 3.0), (3.0, 3.0), (4.0, 5.0),
      (5.0, 6.0))
    val df = rows.map { case (a, b) => ("g", a, b) }.toDF("key", "i1", "i2")
    val r = Inference.cronbachAlpha(df, "key", Seq("i1", "i2"))
      .select("n", "alpha").head()
    assert(r.getLong(0) === 5)
    // var1 = 2.5, var2 = 2.7, cov = 2.5 (hand): α = 2·(1 − 5.2/10.2)
    approx(r.getDouble(1), 2.0 * (1.0 - 5.2 / 10.2), 1e-9)
  }

  test("iccOneWay: strong between-group separation → icc near 1") {
    val df = (Seq.fill(4)(100.0).map(("a", _)) ++
      Seq.fill(4)(200.0).map(("b", _)) ++
      Seq(100.02, 199.98).map(("c", _)).take(0) ++
      Seq.fill(4)(300.0).map(("c", _)))
      .map { case (g, v) => (g, v) }.toDF("g", "v")
      // within-group jitter of one cent so MSW > 0
      .withColumn("v", $"v" + $"g".substr(1, 1).isin("a").cast("int") * 0.0)
    val base = Seq(
      ("a", 100.00), ("a", 100.02), ("a", 99.98),
      ("b", 200.00), ("b", 200.02), ("b", 199.98),
      ("c", 300.00), ("c", 300.02), ("c", 299.98)).toDF("g", "v")
    val r = Inference.iccOneWay(base, "g", "v")
      .select("n", "j", "icc").head()
    assert(r.getLong(0) === 9 && r.getLong(1) === 3)
    assert(r.getDouble(2) > 0.999)
  }

  test("iccOneWay matches the hand-worked balanced ANOVA") {
    // groups a=(1,2,3), b=(4,5,6): SSB = 13.5, SSW = 4 ⇒
    // MSB = 13.5, MSW = 1, n0 = 3, ICC = 12.5/(13.5 + 2·1) = 12.5/15.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Inference.iccOneWay(df, "g", "v")
      .select("msb", "msw", "icc").head()
    approx(r.getDouble(0), 13.5, 1e-6)
    approx(r.getDouble(1), 1.0, 1e-6)
    approx(r.getDouble(2), 12.5 / 15.5, 1e-6)
  }
}
