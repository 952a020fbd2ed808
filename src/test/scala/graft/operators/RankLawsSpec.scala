package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariance laws for the round-12 rank family: a rank statistic must
  * not move under any strictly monotone transform of the values — the
  * defining property that separates it from the moment family, checked
  * end-to-end through the micro-unit machinery (quantization could
  * silently break it; these pin that it does not for transforms that
  * keep distinct hundredth-values distinct). */
class RankLawsSpec extends SparkSpec {
  import spark.implicits._

  // values spaced ≥ 0.01 apart so cubing keeps them distinct in cents
  private val raw = Seq(
    ("k", "a", 1.0), ("k", "a", 2.5), ("k", "a", 4.0), ("k", "a", 2.5),
    ("k", "b", 3.0), ("k", "b", 5.5), ("k", "b", 7.0),
    ("k", "c", 6.0), ("k", "c", 8.0), ("k", "c", 9.5))
  private def df = raw.toDF("key", "g", "v")
  private def cubed = raw.map { case (k, g, v) => (k, g, v * v * v) }
    .toDF("key", "g", "v")

  test("Kruskal-Wallis H is invariant under a monotone transform") {
    val h1 = Inference.kruskalWallisByKey(df, "key", "g", "v")
      .select("h_adj").as[Double].head()
    val h2 = Inference.kruskalWallisByKey(cubed, "key", "g", "v")
      .select("h_adj").as[Double].head()
    assert(h1 === h2, s"$h1 vs $h2") // identical ranks → identical bits
  }

  test("Anderson-Darling A2 is invariant under a monotone transform") {
    val two = df.filter($"g" =!= "c")
    val twoCubed = cubed.filter($"g" =!= "c")
    val a1 = Stats.andersonDarling2(two, "g", "a", "b", "v")
      .select("a2").as[Double].head()
    val a2 = Stats.andersonDarling2(twoCubed, "g", "a", "b", "v")
      .select("a2").as[Double].head()
    assert(a1 === a2, s"$a1 vs $a2")
  }

  test("Friedman chi2 is invariant under a monotone transform") {
    val blocks = Seq(
      (1L, "a", 1.0), (1L, "b", 2.0), (1L, "c", 3.0),
      (2L, "a", 2.0), (2L, "b", 1.0), (2L, "c", 3.0),
      (3L, "a", 1.0), (3L, "b", 3.0), (3L, "c", 2.0))
    val f1 = Inference.friedman(blocks.toDF("s", "t", "v"), "s", "t", "v")
      .select("chi2").as[Double].head()
    val f2 = Inference.friedman(
      blocks.map { case (s, t, v) => (s, t, math.pow(2.0, v)) }
        .toDF("s", "t", "v"), "s", "t", "v")
      .select("chi2").as[Double].head()
    assert(f1 === f2, s"$f1 vs $f2")
  }

  test("Theil index is unit-invariant (up to micro quantization)") {
    val vals = Seq(1.0, 2.0, 3.0, 10.0).map(("k", _))
    val t1 = Stats.theilIndexByKey(vals.toDF("g", "v"), "g", "v")
      .select("theil").as[Double].head()
    val t2 = Stats.theilIndexByKey(
      vals.map { case (g, v) => (g, v * 100.0) }.toDF("g", "v"), "g", "v")
      .select("theil").as[Double].head()
    assert(math.abs(t1 - t2) < 1e-6, s"$t1 vs $t2")
  }

  test("decision stump threshold is order-isomorphic under a " +
      "monotone transform") {
    val rows = Seq((1.0, 1L), (2.0, 1L), (3.0, 0L), (4.0, 0L))
    val t1 = DecisionStump.bestSplit(rows.toDF("x", "y"), "x", "y")
      .select("threshold").as[Double].head()
    val t2 = DecisionStump.bestSplit(
      rows.map { case (x, y) => (x * x, y) }.toDF("x", "y"), "x", "y")
      .select("threshold").as[Double].head()
    assert(t1 === 2.0 && t2 === 4.0) // same split point, mapped
  }
}
