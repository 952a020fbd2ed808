package graft.operators

import graft.SparkSpec

class EffectSizeSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ jarque-bera
  test("jarqueBera matches hand-computed moments on 1..5") {
    // cents-exact values; mean 3, m2 2, m3 0, m4 6.8: skew 0,
    // kurt 1.7, JB = 5/6 * 0.25 * (1.7-3)^2
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("k", _)).toDF("k", "v")
    val r = EffectSize.jarqueBeraByKey(df, "k", "v")
      .select("n", "skew", "kurt", "jb")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 === 5L)
    assert(math.abs(r._2) < 1e-12)
    assert(math.abs(r._3 - 1.7) < 1e-9)
    assert(math.abs(r._4 - 5.0 / 6.0 * 0.25 * 1.69) < 1e-9)
  }

  test("jarqueBera skew sign tracks the heavy tail") {
    val right = Seq(1.0, 1.0, 1.0, 1.0, 10.0).map(("k", _)).toDF("k", "v")
    val s = EffectSize.jarqueBeraByKey(right, "k", "v")
      .select("skew").as[Double].head()
    assert(s > 1.0) // long right tail => positive skew
  }

  test("jarqueBera guards: constant column and n < 2 give nulls") {
    val df = Seq(("c", 5.0), ("c", 5.0), ("one", 3.0)).toDF("k", "v")
    val rows = EffectSize.jarqueBeraByKey(df, "k", "v")
      .select("k", "jb").collect()
    assert(rows.forall(_.isNullAt(1)))
  }

  // --------------------------------------------------------- cohens d
  test("cohensD matches the hand-computed pooled-SD effect") {
    // a = [2,4], b = [1,3]: means 3/2, va = vb = 2, sp2 = 2,
    // d = 1/sqrt(2), g = d * (1 - 3/7)
    val df = Seq(("k", "a", 2.0), ("k", "a", 4.0),
      ("k", "b", 1.0), ("k", "b", 3.0)).toDF("k", "g", "v")
    val r = EffectSize.cohensDByKey(df, "k", "g", "a", "b", "v")
      .select("n_a", "n_b", "mean_a", "mean_b", "d", "g")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 === 2L && r._2 === 2L)
    assert(math.abs(r._3 - 3.0) < 1e-12 && math.abs(r._4 - 2.0) < 1e-12)
    assert(math.abs(r._5 - 1.0 / math.sqrt(2.0)) < 1e-9)
    assert(math.abs(r._6 - (1.0 / math.sqrt(2.0)) * (1.0 - 3.0 / 7.0)) < 1e-9)
  }

  test("cohensD guards: a single-row group yields null d") {
    val df = Seq(("k", "a", 2.0),
      ("k", "b", 1.0), ("k", "b", 3.0)).toDF("k", "g", "v")
    val row = EffectSize.cohensDByKey(df, "k", "g", "a", "b", "v")
      .select("d").collect().head
    assert(row.isNullAt(0))
  }

  // ----------------------------------------------------- cliffs delta
  test("cliffsDelta is 1 under complete separation, 0 for identical groups") {
    val sep = Seq(("k", "a", 3.0), ("k", "a", 4.0),
      ("k", "b", 1.0), ("k", "b", 2.0)).toDF("k", "g", "v")
    val d1 = EffectSize.cliffsDeltaByKey(sep, "k", "g", "a", "b", "v")
      .select("delta").as[Double].head()
    assert(math.abs(d1 - 1.0) < 1e-12)
    val same = Seq(("k", "a", 1.0), ("k", "a", 2.0),
      ("k", "b", 1.0), ("k", "b", 2.0)).toDF("k", "g", "v")
    val d0 = EffectSize.cliffsDeltaByKey(same, "k", "g", "a", "b", "v")
      .select("delta").as[Double].head()
    assert(math.abs(d0) < 1e-12)
  }

  test("cliffsDelta ties follow the midrank half-credit convention") {
    // a = [2], b = [1, 2, 3]: pairs (2>1)=1, (2=2)=0.5, (2<3)=0
    // U = 1.5 => delta = 2*1.5/3 - 1 = 0
    val df = Seq(("k", "a", 2.0), ("k", "b", 1.0), ("k", "b", 2.0),
      ("k", "b", 3.0)).toDF("k", "g", "v")
    val d = EffectSize.cliffsDeltaByKey(df, "k", "g", "a", "b", "v")
      .select("delta").as[Double].head()
    assert(math.abs(d) < 1e-12)
  }

  test("effect sizes are invariant under repartitioning") {
    val df = (1 to 400).map(i =>
      ("k", if (i % 2 == 0) "a" else "b", (i % 37) * 0.5)).toDF("k", "g", "v")
    def run(d: org.apache.spark.sql.DataFrame) = (
      EffectSize.cohensDByKey(d, "k", "g", "a", "b", "v")
        .select("d").as[Double].head(),
      EffectSize.jarqueBeraByKey(d, "k", "v")
        .select("jb").as[Double].head())
    assert(run(df) === run(df.repartition(7)))
  }
}
