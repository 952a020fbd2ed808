package graft.operators

import graft.SparkSpec

class AnovaAd2Spec extends SparkSpec {
  import spark.implicits._

  test("one-way F matches the hand-worked balanced ANOVA") {
    // groups (1,2,3) and (4,5,6): MSB 13.5, MSW 1 → F = 13.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Inference.oneWayAnovaF(df, "g", "v").head()
    assert(r.getLong(2) === 1 && r.getLong(3) === 4) // df1, df2
    assert(math.abs(r.getDouble(4) - 13.5) < 1e-6)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-6)
    assert(math.abs(r.getDouble(6) - 13.5) < 1e-6)
  }

  test("constant within-group values give a null F (MSW = 0)") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    assert(Inference.oneWayAnovaF(df, "g", "v").head().isNullAt(6))
  }

  test("AD two-sample matches the hand-worked 2+2 case") {
    // A = {1,2}, B = {3,4}: A² = 5/3 (up to micro flooring)
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Stats.andersonDarling2(df, "g", "a", "b", "v").head()
    assert(r.getLong(0) === 2 && r.getLong(1) === 2)
    assert(math.abs(r.getDouble(2) - 5.0 / 3.0) < 1e-5)
  }

  test("AD is symmetric in the two samples and small when identical") {
    val rows = (1 to 50).map(i => ("a", (i % 10).toDouble)) ++
      (1 to 50).map(i => ("b", (i % 10).toDouble))
    val same = Stats.andersonDarling2(rows.toDF("g", "v"),
      "g", "a", "b", "v").select("a2").as[Double].head()
    assert(same < 0.5, s"identical → small, got $same")
    val shifted = ((1 to 50).map(i => ("a", (i % 10).toDouble)) ++
      (1 to 50).map(i => ("b", (i % 10).toDouble + 20.0)))
      .toDF("g", "v")
    val far = Stats.andersonDarling2(shifted, "g", "a", "b", "v")
      .select("a2").as[Double].head()
    assert(far > 10.0, s"disjoint → large, got $far")
  }
}
