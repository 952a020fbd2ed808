package graft.operators

import graft.SparkSpec

class TwoWayAnovaSpec extends SparkSpec {
  import spark.implicits._

  /** Balanced 2x2 with 2 obs per cell at mean m(a,b) ± 1. */
  private def grid(m: (Int, Int) => Double) =
    (for {
      a <- 0 to 1; b <- 0 to 1; s <- Seq(-1.0, 1.0)
    } yield (s"a$a", s"b$b", m(a, b) + s)).toDF("a", "b", "v")

  test("a pure main effect loads f_a only") {
    // m = 10a: SS_A = 200, SS_B = SS_AB = 0, MS_E = 2 => F_A = 100
    val df = grid((a, _) => 10.0 * a + 20.0)
    val r = Inference.twoWayAnova(df, "a", "b", "v")
      .select("n", "n_cells", "f_a", "f_b", "f_ab")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 === 8L && r._2 === 4L)
    assert(math.abs(r._3 - 100.0) < 1e-3)
    assert(math.abs(r._4) < 1e-3 && math.abs(r._5) < 1e-3)
  }

  test("a pure interaction loads f_ab only") {
    // m = 10*(a xor b): margins flat, cells split => F_AB = 100
    val df = grid((a, b) => 10.0 * ((a + b) % 2) + 20.0)
    val r = Inference.twoWayAnova(df, "a", "b", "v")
      .select("f_a", "f_b", "f_ab")
      .as[(Double, Double, Double)].head()
    assert(math.abs(r._1) < 1e-3 && math.abs(r._2) < 1e-3)
    assert(math.abs(r._3 - 100.0) < 1e-3)
  }

  test("degenerate designs null the undefined ratios") {
    // single level of a: df_a = 0 => f_a null (others defined)
    val df = Seq(("a0", "b0", 1.0), ("a0", "b0", 2.0),
      ("a0", "b1", 5.0), ("a0", "b1", 6.0)).toDF("a", "b", "v")
    val row = Inference.twoWayAnova(df, "a", "b", "v")
      .select("f_a", "f_ab").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("deterministic under repartitioning") {
    val df = (0 until 400).map(i =>
      (s"a${i % 3}", s"b${i % 5}", (i % 11) * 0.75)).toDF("a", "b", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Inference.twoWayAnova(d, "a", "b", "v")
        .select("f_a", "f_b", "f_ab")
        .as[(Double, Double, Double)].head()
    assert(run(df) === run(df.repartition(7)))
  }
}
