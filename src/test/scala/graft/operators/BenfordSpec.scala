package graft.operators

import graft.SparkSpec

class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("leading digit from exact integer units; zeros and nulls excluded") {
    val df = Seq(Some(1.23), Some(0.94), Some(912.5), Some(-2.5),
      Some(0.0), None).toDF("v")
    val out = Benford.firstDigit(df, "v", scale = 2)
      .select("digit", "n").as[(Int, Long)].collect().toMap
    // 1.23 -> 123 -> 1 ; 0.94 -> 94 -> 9 ; 912.5 -> 91250 -> 9 ;
    // -2.5 -> 250 -> 2 ; 0.0 -> 0 (excluded) ; null excluded
    assert(out == Map(1 -> 1L, 2 -> 1L, 9 -> 2L))
  }

  test("frequencies sum to 1 and expected matches log10(1+1/d)") {
    val df = (1 to 900).map(i => i.toDouble).toDF("v")
    val rows = Benford.firstDigit(df, "v", scale = 0)
      .select("digit", "freq", "expected")
      .as[(Int, Double, Double)].collect()
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-12)
    rows.foreach { case (d, _, e) =>
      assert(e == math.log10(1.0 + 1.0 / d))
    }
    // 1..900: digits 1-8 lead 111 ints each (x, 1x, 10x-19x...), 9 leads 12
    val n = Benford.firstDigit(df, "v", scale = 0)
      .select("digit", "n").as[(Int, Long)].collect().toMap
    assert(n(1) == 111L && n(9) == 12L)
  }

  test("deviation is freq minus expected") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val rows = Benford.firstDigit(df, "v", scale = 0)
      .select("freq", "expected", "deviation")
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (f, e, dev) => assert(dev == f - e) }
  }
}
