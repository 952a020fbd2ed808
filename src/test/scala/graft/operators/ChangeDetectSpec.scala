package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class ChangeDetectSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def run(rows: Seq[(String, Long, Long, Double)], h: Double) =
    ChangeDetect.cusum(
      rows.map { case (k, s, id, v) => (k, ts(s), id, v) }
        .toDF("k", "t", "id", "v"),
      "k", "t", "id", "v", h)
      .select("id", "cusum", "is_change")
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("stable series stays near zero; level shift accumulates") {
    // 4 rows at 10 then 4 at 20: mean 15; cusum walks -5,-10,-15,-20
    // then recovers -15,-10,-5,0.
    val rows = (1 to 4).map(i => ("k", i.toLong, i.toLong, 10.0)) ++
      (5 to 8).map(i => ("k", i.toLong, i.toLong, 20.0))
    val out = run(rows, h = 12.0)
    assert(out(1L)._1 == -5.0 && out(4L)._1 == -20.0)
    assert(out(8L)._1 == 0.0)
    assert(!out(2L)._2 && out(3L)._2 && out(4L)._2 && !out(8L)._2)
  }

  test("the final cusum is always exactly zero") {
    val rows = Seq(("k", 1L, 1L, 3.17), ("k", 2L, 2L, 9.41),
      ("k", 3L, 3L, 0.07))
    val out = run(rows, 1000.0)
    assert(out(3L)._1 == 0.0)
  }

  test("keys are independent and null values are dropped") {
    val df = Seq(
      ("a", ts(1), 1L, Some(5.0)), ("a", ts(2), 2L, Some(15.0)),
      ("b", ts(1), 3L, Some(100.0)), ("b", ts(2), 4L, None))
      .toDF("k", "t", "id", "v")
    val out = ChangeDetect.cusum(df, "k", "t", "id", "v", 1.0)
      .select("id", "cusum").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == -5.0 && out(2L) == 0.0)
    assert(out(3L) == 0.0) // single-row key: mean = value
  }

  test("cents fixing keeps fractional values exact") {
    // values with 2 decimals: mean of (1.25, 1.75) = 1.50 exactly in
    // cents; cusum after row 1 = -0.25 exactly.
    val out = run(Seq(("k", 1L, 1L, 1.25), ("k", 2L, 2L, 1.75)), 10.0)
    assert(out(1L)._1 == -0.25)
  }
}
