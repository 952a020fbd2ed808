package graft.operators

import graft.SparkSpec

class CumIncidenceSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: (Double, Int)*) = rows.toDF("dur", "cause")

  test("matches the hand-worked alternating-cause sequence") {
    // t=1 cause1 (S⁻=1):   cif1 = 1/3
    // t=2 cause2 (S⁻=2/3): cif2 = 1/3
    // t=3 cause1 (S⁻=1/3): cif1 = 2/3
    val out = Survival.cumulativeIncidence(
      mk((1.0, 1), (2.0, 2), (3.0, 1)), "dur", "cause")
      .orderBy("t").collect()
    assert(out.length === 3)
    assert(math.abs(out(0).getDouble(4) - 1.0 / 3.0) < 1e-9)
    assert(math.abs(out(1).getDouble(5) - 1.0 / 3.0) < 1e-9)
    assert(math.abs(out(2).getDouble(4) - 2.0 / 3.0) < 1e-9)
    assert(math.abs(out(2).getDouble(5) - 1.0 / 3.0) < 1e-9)
  }

  test("cif1 + cif2 never exceeds 1 and is monotone") {
    val rows = (1 to 30).map(i =>
      (i.toDouble, if (i % 3 == 0) 0 else 1 + i % 2))
    val out = Survival.cumulativeIncidence(mk(rows: _*), "dur", "cause")
      .orderBy("t").select("cif1", "cif2")
      .as[(Double, Double)].collect()
    var prev = 0.0
    out.foreach { case (c1, c2) =>
      val tot = c1 + c2
      assert(tot <= 1.0 + 1e-9 && tot >= prev - 1e-12, s"($c1,$c2)")
      prev = tot
    }
  }

  test("censored subjects shrink the risk set without incrementing") {
    // one early censor: later hazards divide a smaller risk set
    val withCens = mk((1.0, 0), (2.0, 1), (3.0, 2))
    val out = Survival.cumulativeIncidence(withCens, "dur", "cause")
      .orderBy("t").collect()
    assert(out.length === 2) // t=1 has no events → absent
    assert(out(0).getLong(1) === 2) // risk set after the censor
    assert(math.abs(out(0).getDouble(4) - 0.5) < 1e-9)
  }

  test("naive 1-KM per cause would overstate; AJ totals stay exact") {
    // both causes equally likely, no censoring → each cif → 0.5
    val rows = (1 to 40).map(i => (i.toDouble, 1 + i % 2))
    val last = Survival.cumulativeIncidence(mk(rows: _*), "dur", "cause")
      .orderBy(org.apache.spark.sql.functions.col("t").desc)
      .select("cif1", "cif2").as[(Double, Double)].head()
    assert(math.abs(last._1 + last._2 - 1.0) < 1e-6)
    assert(math.abs(last._1 - 0.5) < 0.05)
  }
}
