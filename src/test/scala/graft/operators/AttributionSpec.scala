package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def run(rows: Seq[(Long, Long, Long, String)],
      maxLagUs: Option[Long] = None) =
    Attribution.singleTouch(
      rows.map { case (u, s, id, ty) => (u, ts(s), id, ty) }
        .toDF("u", "t", "id", "ty"),
      "u", "t", "id", "ty", Seq("click", "view"), "buy", maxLagUs)
      .select("conv_id", "first_touch_id", "last_touch_id")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("first and last touch resolve independently") {
    val out = run(Seq(
      (1L, 10L, 1L, "click"),
      (1L, 20L, 2L, "view"),
      (1L, 30L, 3L, "buy"),
      (1L, 40L, 4L, "click"),
      (1L, 50L, 5L, "buy")))
    assert(out(3L) == ((Some(1L), Some(2L))))
    assert(out(5L) == ((Some(1L), Some(4L))))
  }

  test("a conversion with no preceding touch attributes to nothing") {
    val out = run(Seq(
      (1L, 10L, 1L, "buy"),
      (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "buy")))
    assert(out(1L) == ((None, None)))
    assert(out(3L) == ((Some(2L), Some(2L))))
  }

  test("users do not leak touches into each other") {
    val out = run(Seq(
      (1L, 10L, 1L, "click"),
      (2L, 20L, 2L, "buy")))
    assert(out(2L) == ((None, None)))
  }

  test("same-timestamp resolution follows the tie column") {
    val out = run(Seq(
      (1L, 10L, 1L, "click"),
      (1L, 10L, 2L, "buy"),
      (1L, 10L, 3L, "view")))
    // the click (id 1) sorts before the buy, the view (id 3) after
    assert(out(2L) == ((Some(1L), Some(1L))))
  }

  test("maxLag voids only the last-touch pair") {
    val lag = 15L * 1000000L // 15 s in micros
    val out = run(Seq(
      (1L, 0L, 1L, "click"),
      (1L, 100L, 2L, "buy"),    // 100 s after the only touch
      (1L, 110L, 3L, "click"),
      (1L, 120L, 4L, "buy")),   // 10 s after touch 3
      maxLagUs = Some(lag))
    assert(out(2L) == ((Some(1L), None)))
    assert(out(4L) == ((Some(1L), Some(3L))))
  }

  test("non-touch non-conversion events are invisible") {
    val out = run(Seq(
      (1L, 10L, 1L, "click"),
      (1L, 20L, 2L, "error"),
      (1L, 30L, 3L, "buy")))
    assert(out(3L) == ((Some(1L), Some(1L))))
  }
}
