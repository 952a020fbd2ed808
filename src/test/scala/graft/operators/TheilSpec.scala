package graft.operators

import graft.SparkSpec

class TheilSpec extends SparkSpec {
  import spark.implicits._

  test("perfect equality gives exactly zero (up to micro quantization)") {
    val df = Seq.fill(6)(("k", 42.0)).toDF("g", "v")
    val r = Stats.theilIndexByKey(df, "g", "v")
      .select("n", "theil").as[(Long, Double)].head()
    assert(r._1 === 6)
    assert(math.abs(r._2) < 1e-9)
  }

  test("matches the hand-worked unequal sample") {
    // x = (1,1,1,3), μ = 1.5:
    // T = (1/4)·[3·(2/3)·ln(2/3) + 2·ln 2] = 0.14384103622589…
    val df = Seq(1.0, 1.0, 1.0, 3.0).map(("k", _)).toDF("g", "v")
    val r = Stats.theilIndexByKey(df, "g", "v")
      .select("theil").as[Double].head()
    assert(math.abs(r - 0.14384103622589045) < 1e-6)
  }

  test("non-positive and sub-half-micro values are excluded") {
    val df = Seq(("k", 2.0), ("k", -1.0), ("k", 0.0), ("k", 0.001),
      ("k", 2.0)).toDF("g", "v")
    val r = Stats.theilIndexByKey(df, "g", "v")
      .select("n", "theil").as[(Long, Double)].head()
    assert(r._1 === 2) // only the two 2.0 rows survive
    assert(math.abs(r._2) < 1e-9)
  }

  test("concentration raises Theil toward ln(n)") {
    val concentrated = (Seq.fill(9)(0.01) ++ Seq(1000.0))
      .map(("k", _)).toDF("g", "v")
    val r = Stats.theilIndexByKey(concentrated, "g", "v")
      .select("theil").as[Double].head()
    assert(r > 2.0 && r <= math.log(10.0) + 1e-6)
  }
}
