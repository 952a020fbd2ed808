package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class SequentialSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val S = 1000000L // one second in micros

  private def sessions(rows: Seq[(Long, Long, Long)], gapS: Long, capS: Long,
      repart: Int = 1) = {
    val df = rows.map { case (u, s, id) => (u, ts(s), id) }
      .toDF("u", "t", "id")
    Sequential.sessionizeCapped(
      if (repart > 1) df.repartition(repart) else df,
      "u", "t", "id", gapS * S, capS * S)
      .select("id", "session_idx").as[(Long, Long)].collect().toMap
  }

  test("gap break and cap break both open new sessions") {
    // 0, 10 | 200 (gap 190 > 60), 210, 250 | 320 (span 120 > 100 cap,
    // though the gap 320-250=70... use 300: gap 50 < 60 but span
    // 300-200=100 is NOT > cap; 310: gap 60 NOT > 60; 311: span 111 > cap
    val rows = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 200L, 3L),
      (1L, 210L, 4L), (1L, 250L, 5L), (1L, 301L, 6L))
    val out = sessions(rows, gapS = 60, capS = 100)
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(3L) == 2L && out(4L) == 2L && out(5L) == 2L)
    // 301: gap 301-250 = 51 <= 60, but span 301-200 = 101 > 100 -> new
    assert(out(6L) == 3L)
  }

  test("the cap measures from the session START — a window cannot fake it") {
    // steady 40s cadence, gap never binds; cap 100 breaks at 120, 240
    val rows = (0 to 6).map(i => (1L, i * 40L, i.toLong + 1))
    val out = sessions(rows, gapS = 60, capS = 100)
    assert((1 to 7).map(i => out(i.toLong)) == Seq(1, 1, 1, 2, 2, 2, 3))
  }

  test("users are independent and results survive repartitioning") {
    val rows = (0 to 50).flatMap(i =>
      Seq((1L, i * 30L, i.toLong * 2), (2L, i * 45L, i.toLong * 2 + 1)))
    val a = sessions(rows, 60, 100, repart = 1)
    val b = sessions(rows, 60, 100, repart = 7)
    assert(a == b)
  }

  test("debounce keeps the first row and suppresses bursts against " +
      "the last KEPT row") {
    val df = Seq((1L, 0L, 1L), (1L, 30L, 2L), (1L, 59L, 3L),
      (1L, 60L, 4L), (1L, 90L, 5L), (1L, 125L, 6L))
      .map { case (u, s, id) => (u, ts(s), id) }.toDF("u", "t", "id")
    val kept = Sequential.debounce(df, "u", "t", "id", 60L * S)
      .select("id").as[Long].collect().toSet
    // 0 kept; 30, 59 suppressed; 60 kept (>= 60 since 0); 90 suppressed
    // (30 since 60); 125 kept (65 since 60)
    assert(kept == Set(1L, 4L, 6L))
  }

  test("debounce: a naive previous-ROW gap would differ on a burst") {
    // rows every 40s with min gap 60: previous-row logic keeps only the
    // first (every consecutive gap < 60); last-KEPT logic keeps 0, 80,
    // 160 (each 80 >= 60 after the kept one)
    val df = (0 to 4).map(i => (1L, ts(i * 40L), i.toLong))
      .toDF("u", "t", "id")
    val kept = Sequential.debounce(df, "u", "t", "id", 60L * S)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 4L))
  }

  test("ewma: hand-computed chain, per-key seeding, null drop") {
    // α = 0.25: s1 = 8; s2 = .25·4 + .75·8 = 7; s3 = .25·3 + .75·7 = 6
    val df = Seq((1L, ts(0), 1L, Some(8.0)), (1L, ts(10), 2L, Some(4.0)),
      (1L, ts(15), 3L, None), (1L, ts(20), 4L, Some(3.0)),
      (2L, ts(5), 5L, Some(40.0)))
      .toDF("u", "t", "id", "v")
    val out = Sequential.ewma(df, "u", "t", "id", "v", 0.25)
      .select("id", "ewma").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 8.0, 2L -> 7.0, 4L -> 6.0, 5L -> 40.0))
  }

  test("ewma: partitioning cannot perturb the smoothed doubles") {
    val rows = (0 until 200).map(i =>
      ((i % 5).toLong, ts(i * 7L), i.toLong, math.sin(i) * 100))
    val df = rows.toDF("u", "t", "id", "v")
    val one = Sequential.ewma(df, "u", "t", "id", "v", 0.25)
      .select("id", "ewma").as[(Long, Double)].collect().toMap
    val many = Sequential.ewma(
        df.orderBy(org.apache.spark.sql.functions.rand(7)).repartition(13),
        "u", "t", "id", "v", 0.25)
      .select("id", "ewma").as[(Long, Double)].collect().toMap
    assert(one == many) // bit-equal, not approximately
  }
}
