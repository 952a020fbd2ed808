package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof matches latest state at-or-before each left timestamp") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before any state -> null
      (2L, 10L, ts("2024-01-01 01:00:00")), // after s1 -> "a"
      (3L, 10L, ts("2024-01-01 02:00:00")), // exactly at s2 -> "b" (<=)
      (4L, 10L, ts("2024-01-01 03:00:00")), // after s2 -> "b"
      (5L, 20L, ts("2024-01-01 05:00:00"))  // other key, no state -> null
    ).toDF("event_id", "user_id", "ts")
    val state = Seq(
      (10L, ts("2024-01-01 00:30:00"), "a"),
      (10L, ts("2024-01-01 02:00:00"), "b")
    ).toDF("user_id", "ts", "state")

    val out = AsOfJoin.asof(left, state, "user_id", "ts", "ts")
      .select("event_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(1L -> None, 2L -> Some("a"), 3L -> Some("b"),
      4L -> Some("b"), 5L -> None))
  }

  test("multiple payload columns carry together") {
    val left = Seq((1L, 1L, ts("2024-01-01 01:00:00"))).toDF("event_id", "k", "ts")
    val state = Seq((1L, ts("2024-01-01 00:00:00"), "x", 42.0))
      .toDF("k", "ts", "name", "score")
    val row = AsOfJoin.asof(left, state, "k", "ts", "ts").collect().head
    assert(row.getAs[String]("name") == "x")
    assert(row.getAs[Double]("score") == 42.0)
  }
}
