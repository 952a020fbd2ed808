package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def interp(rows: Seq[(String, Long, Long, Option[Double])]) =
    Interpolate.linear(
      rows.map { case (k, s, id, v) => (k, ts(s), id, v) }
        .toDF("k", "t", "id", "v"),
      "k", "t", "id", "v")
      .select("k", "id", "value_interp")
      .as[(String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("interior gaps fill linearly; observed rows pass through") {
    val out = interp(Seq(
      ("a", 0L, 1L, Some(10.0)),
      ("a", 10L, 2L, None),
      ("a", 40L, 3L, Some(50.0)),
      ("a", 50L, 4L, Some(0.0))))
    assert(out(("a", 1L)).contains(10.0))
    // 10 + (50-10) * (10/40) = 20
    assert(out(("a", 2L)).contains(20.0))
    assert(out(("a", 3L)).contains(50.0))
    assert(out(("a", 4L)).contains(0.0))
  }

  test("boundary nulls stay null (no extrapolation)") {
    val out = interp(Seq(
      ("a", 0L, 1L, None),
      ("a", 10L, 2L, Some(5.0)),
      ("a", 20L, 3L, None)))
    assert(out(("a", 1L)).isEmpty)
    assert(out(("a", 3L)).isEmpty)
  }

  test("consecutive gaps each interpolate against the same bracket") {
    val out = interp(Seq(
      ("a", 0L, 1L, Some(0.0)),
      ("a", 10L, 2L, None),
      ("a", 20L, 3L, None),
      ("a", 30L, 4L, Some(30.0))))
    assert(out(("a", 2L)).contains(10.0))
    assert(out(("a", 3L)).contains(20.0))
  }

  test("keys are independent") {
    val out = interp(Seq(
      ("a", 0L, 1L, Some(0.0)), ("a", 20L, 2L, None),
      ("a", 40L, 3L, Some(4.0)),
      ("b", 0L, 4L, Some(100.0)), ("b", 20L, 5L, None),
      ("b", 40L, 6L, Some(300.0))))
    assert(out(("a", 2L)).contains(2.0))
    assert(out(("b", 5L)).contains(200.0))
  }

  test("bracketing observations at one timestamp degenerate to v0") {
    // null row shares its ts with both neighbors; tie order is by id,
    // so the bracket is (id=1, v=7) before and (id=3, v=9) after with
    // dT = 0 -> fill = v0, not NaN.
    val out = interp(Seq(
      ("a", 10L, 1L, Some(7.0)),
      ("a", 10L, 2L, None),
      ("a", 10L, 3L, Some(9.0))))
    assert(out(("a", 2L)).contains(7.0))
  }
}
