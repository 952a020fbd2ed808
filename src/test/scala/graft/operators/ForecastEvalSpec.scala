package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class ForecastEvalSpec extends SparkSpec {
  import spark.implicits._

  // one event per (day, repetition) so the daily count equals the
  // repetition factor — lets the series be written down directly
  private def events(key: String, series: Seq[Int]): Seq[(String, Timestamp)] =
    series.zipWithIndex.flatMap { case (y, day) =>
      (0 until y).map(_ =>
        (key, Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")))
    }

  test("MASE matches the hand computation on a season-2 series") {
    // series 4,1,5,2,6: with season=2 the scored days are d3,d4,d5
    // seasonal errors |5-4|,|2-1|,|6-5| = 1,1,1 -> mae 1
    // naive errors    |5-1|,|2-5|,|6-2| = 4,3,4 -> mae 11/3
    val df = events("a", Seq(4, 1, 5, 2, 6)).toDF("k", "ts")
    val out = ForecastEval.seasonalNaiveDaily(df, "k", "ts", season = 2)
      .as[(String, Long, Double, Double, Option[Double])].collect().head
    assert(out._2 === 3L)
    assert(out._3 === 1.0)
    assert(out._4 === 11.0 / 3.0)
    assert(out._5.get === 3.0 / 11.0)
  }

  test("perfectly seasonal series scores MASE 0; flat series yields null") {
    val seasonal = events("s", Seq(3, 1, 3, 1, 3, 1)).toDF("k", "ts")
    val o1 = ForecastEval.seasonalNaiveDaily(seasonal, "k", "ts", 2)
      .as[(String, Long, Double, Double, Option[Double])].collect().head
    assert(o1._3 === 0.0 && o1._5.get === 0.0)
    // constant series: naive error 0 -> mase null (division guarded)
    val flat = events("f", Seq(2, 2, 2, 2)).toDF("k", "ts")
    val o2 = ForecastEval.seasonalNaiveDaily(flat, "k", "ts", 2)
      .as[(String, Long, Double, Double, Option[Double])].collect().head
    assert(o2._3 === 0.0 && o2._5.isEmpty)
  }

  test("short series (fewer days than season+1) produces no scored rows") {
    val df = events("x", Seq(1, 2)).toDF("k", "ts")
    assert(ForecastEval.seasonalNaiveDaily(df, "k", "ts", 7).count() === 0L)
  }
}
