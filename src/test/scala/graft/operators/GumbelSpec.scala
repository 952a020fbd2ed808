package graft.operators

import graft.SparkSpec

class GumbelSpec extends SparkSpec {
  import spark.implicits._

  test("method-of-moments fit matches the hand computation") {
    // block maxima 1, 2, 3: mean 2, sample var 1 →
    // beta = √6/π, mu = 2 − γ·beta
    val df = Seq(("a", 1.0), ("a", 0.5), ("b", 2.0), ("c", 3.0))
      .toDF("blk", "v")
    val r = Stats.gumbelFit(df, "blk", "v", returnPeriod = 20).head()
    assert(r.getLong(0) === 3)
    val beta = Stats.GumbelSqrt6OverPi
    val mu = 2.0 - Stats.EulerGamma * beta
    assert(math.abs(r.getDouble(2) - mu) < 1e-12)
    assert(math.abs(r.getDouble(3) - beta) < 1e-12)
    val q = -math.log(-math.log(1.0 - 1.0 / 20))
    assert(math.abs(r.getDouble(4) - (mu + beta * q)) < 1e-12)
  }

  test("the return level grows with the return period") {
    val df = (1 to 20).map(i => (i.toLong, (i % 7 + 1).toDouble * 3))
      .toDF("blk", "v")
    val r20 = Stats.gumbelFit(df, "blk", "v", 20)
      .select("return_level").as[Double].head()
    val r100 = Stats.gumbelFit(df, "blk", "v", 100)
      .select("return_level").as[Double].head()
    assert(r100 > r20, s"$r100 vs $r20")
  }

  test("degenerate maxima (zero variance) yield a null fit") {
    val df = Seq(("a", 5.0), ("b", 5.0), ("c", 5.0)).toDF("blk", "v")
    val r = Stats.gumbelFit(df, "blk", "v").head()
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-12) // mean still reported
  }
}
