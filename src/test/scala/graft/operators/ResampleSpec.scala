package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("dailyCalendar spans each key's own horizon") {
    val obs = Seq(
      ("a", d("2024-01-01")), ("a", d("2024-01-04")),
      ("b", d("2024-02-10"))).toDF("k", "day")
    val cal = Resample.dailyCalendar(obs, "k", "day")
      .as[(String, Date)].collect().toSet
    assert(cal == Set(
      ("a", d("2024-01-01")), ("a", d("2024-01-02")),
      ("a", d("2024-01-03")), ("a", d("2024-01-04")),
      ("b", d("2024-02-10"))))
  }

  test("fillForward carries the last non-null; leading nulls stay null") {
    val rows = Seq(
      ("a", 1, None), ("a", 2, Some(5.0)), ("a", 3, None),
      ("a", 4, None), ("a", 5, Some(7.0)), ("a", 6, None),
      ("b", 1, None)).toDF("k", "o", "v")
    val got = Resample.fillForward(rows, Seq("k"), "o", "v", "f")
      .select($"k", $"o", $"f").as[(String, Int, Option[Double])]
      .collect().toSet
    assert(got == Set(
      ("a", 1, None), ("a", 2, Some(5.0)), ("a", 3, Some(5.0)),
      ("a", 4, Some(5.0)), ("a", 5, Some(7.0)), ("a", 6, Some(7.0)),
      ("b", 1, None)))
  }

  test("dailyPanel densifies gaps with n=0 and forward-fills the aggregate") {
    val ev = Seq(
      ("u1", "2024-01-01 10:00:00", 2.0),
      ("u1", "2024-01-01 11:00:00", 3.0),
      ("u1", "2024-01-04 09:00:00", 10.0))
      .toDF("u", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Resample.dailyPanel(ev, "u", "ts",
        sum(col("v").cast("decimal(18,2)")).cast("double"))
      .select($"u", $"day", $"n", $"agg_value", $"ffill_value")
      .as[(String, Date, Long, Option[Double], Option[Double])]
      .collect().toSet
    assert(got == Set(
      ("u1", d("2024-01-01"), 2L, Some(5.0), Some(5.0)),
      ("u1", d("2024-01-02"), 0L, None, Some(5.0)),
      ("u1", d("2024-01-03"), 0L, None, Some(5.0)),
      ("u1", d("2024-01-04"), 1L, Some(10.0), Some(10.0))))
  }
}
