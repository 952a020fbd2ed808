package graft.operators

import graft.SparkSpec

class CochranArmitageSpec extends SparkSpec {
  import spark.implicits._

  test("matches the hand-worked dose-response table") {
    // doses 0,1,2 with n = 4 each; successes 1, 2, 3 → perfect trend.
    // N = 12, R = 6, scores in cents s = 0,100,200:
    // Σsy = 2·100 + 3·200 = 800; Σs = 1200; Σs² = 4·100² + 4·200² = 2e5
    // T = 800 − 1200·6/12 = 200
    // Var = .5·.5·(2e5 − 1200²/12) = .25·8e4 = 2e4 → z = 200/√2e4
    val rows = Seq.fill(3)((0.0, 0L)) ++ Seq((0.0, 1L)) ++
      Seq.fill(2)((1.0, 0L)) ++ Seq.fill(2)((1.0, 1L)) ++
      Seq((2.0, 0L)) ++ Seq.fill(3)((2.0, 1L))
    val df = rows.toDF("dose", "y")
    val r = Inference.cochranArmitage(df, "dose", "y")
      .select("n", "r", "z").as[(Long, Long, Double)].head()
    assert(r._1 === 12 && r._2 === 6)
    assert(math.abs(r._3 - 200.0 / math.sqrt(20000.0)) < 1e-12)
  }

  test("z is null when the outcome is constant") {
    val df = Seq((0.0, 1L), (1.0, 1L), (2.0, 1L)).toDF("dose", "y")
    assert(Inference.cochranArmitage(df, "dose", "y").head().isNullAt(2))
  }

  test("z is null when the score is constant") {
    val df = Seq((1.0, 0L), (1.0, 1L), (1.0, 1L)).toDF("dose", "y")
    assert(Inference.cochranArmitage(df, "dose", "y").head().isNullAt(2))
  }

  test("the statistic is invariant to the score unit") {
    val base = Seq((0.0, 0L), (1.0, 1L), (2.0, 0L), (3.0, 1L),
      (4.0, 1L), (5.0, 1L))
    val z1 = Inference.cochranArmitage(base.toDF("dose", "y"),
      "dose", "y").select("z").as[Double].head()
    val z10 = Inference.cochranArmitage(
      base.map { case (d, y) => (d * 10, y) }.toDF("dose", "y"),
      "dose", "y").select("z").as[Double].head()
    assert(math.abs(z1 - z10) < 1e-12)
  }
}
