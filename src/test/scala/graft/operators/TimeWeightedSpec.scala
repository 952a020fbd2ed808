package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TimeWeightedSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def twa(rows: Seq[(String, Long, Long, Double)]) =
    TimeWeighted.average(
      rows.map { case (k, s, id, v) => (k, ts(s), id, v) }
        .toDF("k", "t", "id", "v"),
      "k", "t", "id", "v")
      .select("k", "held_seconds", "twa")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("value weighted by holding time, not sample count") {
    // 10 held for 90 s, then 100 held for 10 s (closed by a final obs):
    // twa = (10*90 + 100*10) / 100 = 19
    val out = twa(Seq(("k", 0L, 1L, 10.0), ("k", 90L, 2L, 100.0),
      ("k", 100L, 3L, 0.0)))
    assert(out("k") == ((100L, Some(19.0))))
  }

  test("oversampling an idle value does not skew the average") {
    // same trajectory sampled at different rates gives the same TWA
    val sparse = twa(Seq(("k", 0L, 1L, 10.0), ("k", 100L, 2L, 50.0),
      ("k", 200L, 3L, 0.0)))
    val dense = twa(Seq(("k", 0L, 1L, 10.0), ("k", 25L, 2L, 10.0),
      ("k", 50L, 3L, 10.0), ("k", 75L, 4L, 10.0), ("k", 100L, 5L, 50.0),
      ("k", 200L, 6L, 0.0)))
    assert(sparse("k")._2 == dense("k")._2)
  }

  test("the final observation contributes no interval") {
    val out = twa(Seq(("k", 0L, 1L, 5.0), ("k", 60L, 2L, 999.0)))
    assert(out("k") == ((60L, Some(5.0))))
  }

  test("single-observation keys report zero held time and null twa") {
    val out = twa(Seq(("k", 0L, 1L, 42.0)))
    // one row, no successor: the interval sum is empty -> no rows at all
    // OR a null twa; either way no fabricated average
    assert(!out.contains("k") || out("k")._2.isEmpty)
  }

  test("keys are independent and sub-second holds truncate") {
    val df = Seq(
      ("a", new Timestamp(0L), 1L, 10.0),
      ("a", new Timestamp(1500L), 2L, 20.0),  // 1.5 s -> 1 s held
      ("a", new Timestamp(3000L), 3L, 0.0),
      ("b", new Timestamp(0L), 4L, 7.0),
      ("b", new Timestamp(10000L), 5L, 0.0))
      .toDF("k", "t", "id", "v")
    val out = TimeWeighted.average(df, "k", "t", "id", "v")
      .select("k", "held_seconds", "twa")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a")._1 == 2L) // 1 + 1 truncated seconds
    assert(out("b") == ((10L, Some(7.0))))
  }
}
