package graft.operators

import graft.SparkSpec
import java.sql.Date

class StreaksSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: String, h: Int = 9) =
    java.sql.Timestamp.valueOf(s"$d 0$h:00:00")

  test("dailyStreaks: hand-computed islands, earliest longest start") {
    // u1: 1,2,3 | 5 | 7,8  -> longest 3, 3 streaks, 6 active days
    // u2: 1 | 3 | 5        -> longest 1 (tie x3), earliest start wins
    val rows = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-02")), (1L, ts("2024-01-03")),
      (1L, ts("2024-01-05")), (1L, ts("2024-01-07")), (1L, ts("2024-01-08")),
      (2L, ts("2024-01-01")), (2L, ts("2024-01-03")), (2L, ts("2024-01-05"))
    ).toDF("user_id", "ts")
    val out = Streaks.dailyStreaks(rows, "user_id", "ts")
      .as[(Long, Long, Long, Long, Date)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5.toString))).toMap
    assert(out(1L) === ((3L, 3L, 6L, "2024-01-01")))
    assert(out(2L) === ((1L, 3L, 3L, "2024-01-01")))
  }

  test("dailyStreaks: same-day repeats collapse to one active day") {
    val rows = Seq(
      (1L, ts("2024-02-01", 1)), (1L, ts("2024-02-01", 8)),
      (1L, ts("2024-02-02", 3))).toDF("user_id", "ts")
    val out = Streaks.dailyStreaks(rows, "user_id", "ts")
      .as[(Long, Long, Long, Long, Date)].head()
    assert(out._2 === 2L && out._3 === 1L && out._4 === 2L)
  }

  test("dailyStreaks: null entities and timestamps are excluded") {
    val rows = Seq(
      (Some(1L), Some(ts("2024-03-01"))),
      (None, Some(ts("2024-03-02"))),
      (Some(1L), Option.empty[java.sql.Timestamp])
    ).toDF("user_id", "ts")
    val out = Streaks.dailyStreaks(rows, "user_id", "ts").collect()
    assert(out.length === 1 && out(0).getLong(1) === 1L)
  }

  test("dailyStreaks: month and year boundaries still chain") {
    val rows = Seq(
      (1L, ts("2023-12-31")), (1L, ts("2024-01-01")), (1L, ts("2024-01-02"))
    ).toDF("user_id", "ts")
    val out = Streaks.dailyStreaks(rows, "user_id", "ts")
      .as[(Long, Long, Long, Long, Date)].head()
    assert(out._2 === 3L && out._5.toString === "2023-12-31")
  }

  test("plan: the window sorts the distinct-day grid, no join") {
    val rows = Seq((1L, ts("2024-01-01"))).toDF("user_id", "ts")
    val p = Streaks.dailyStreaks(rows, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"unexpected join in plan:\n$p")
  }
}
