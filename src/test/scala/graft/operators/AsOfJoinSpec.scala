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

  test("forward asof matches earliest state at-or-after each left timestamp") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before s1 -> "a"
      (2L, 10L, ts("2024-01-01 00:30:00")), // exactly at s1 -> "a" (>=)
      (3L, 10L, ts("2024-01-01 01:00:00")), // between -> "b"
      (4L, 10L, ts("2024-01-01 03:00:00")), // after all state -> null
      (5L, 20L, ts("2024-01-01 00:00:00"))  // other key, no state -> null
    ).toDF("event_id", "user_id", "ts")
    val state = Seq(
      (10L, ts("2024-01-01 00:30:00"), "a"),
      (10L, ts("2024-01-01 02:00:00"), "b")
    ).toDF("user_id", "ts", "state")

    val out = AsOfJoin.asofDirectional(left, state, "user_id", "ts", "ts",
        forward = true)
      .select("event_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(1L -> Some("a"), 2L -> Some("a"), 3L -> Some("b"),
      4L -> None, 5L -> None))
  }

  test("tolerance nulls matches beyond the bound, keeps those inside") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 01:00:00")), // 30 min after s1 -> inside 1h
      (2L, 10L, ts("2024-01-01 02:00:00"))  // 90 min after s1 -> outside 1h
    ).toDF("event_id", "user_id", "ts")
    val state = Seq((10L, ts("2024-01-01 00:30:00"), "a"))
      .toDF("user_id", "ts", "state")

    val back = AsOfJoin.asofDirectional(left, state, "user_id", "ts", "ts",
        forward = false, toleranceMicros = Some(3600L * 1000000L))
      .select("event_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(back == Map(1L -> Some("a"), 2L -> None))

    // Forward with tolerance: probes before the state row.
    val fleft = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // 30 min before s1 -> inside
      (2L, 10L, ts("2023-12-31 22:00:00"))  // 2.5 h before s1 -> outside
    ).toDF("event_id", "user_id", "ts")
    val fwd = AsOfJoin.asofDirectional(fleft, state, "user_id", "ts", "ts",
        forward = true, toleranceMicros = Some(3600L * 1000000L))
      .select("event_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(fwd == Map(1L -> Some("a"), 2L -> None))
  }

  test("nearest row with null payload wins — no fallback to older rows") {
    // The match is the nearest ROW: its null payload must come through
    // as null, not be papered over by an older row's value (DuckDB ASOF
    // semantics; also keeps multi-column payloads from mixing rows).
    val left = Seq((1L, 10L, ts("2024-01-01 02:00:00")))
      .toDF("event_id", "user_id", "ts")
    val state = Seq(
      (10L, ts("2024-01-01 00:00:00"), Some("A"), Some(1.0)),
      (10L, ts("2024-01-01 01:59:00"), Option.empty[String], Some(2.0))
    ).toDF("user_id", "ts", "name", "score")
    val row = AsOfJoin.asof(left, state, "user_id", "ts", "ts").collect().head
    assert(row.isNullAt(row.fieldIndex("name"))) // nearest row's null
    assert(row.getAs[Double]("score") == 2.0)    // same row's non-null

    // and tolerance applies to that same row, not to a fallback
    val tight = AsOfJoin.asofDirectional(left, state, "user_id", "ts", "ts",
        forward = false, toleranceMicros = Some(60L * 1000000L))
      .collect().head
    assert(tight.isNullAt(tight.fieldIndex("name")))
    // probe 02:00, nearest state 01:59 -> 60 s gap == tolerance -> kept
    assert(tight.getAs[Double]("score") == 2.0)
  }

  test("backward via asofDirectional equals asof") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 01:00:00")),
      (3L, 10L, ts("2024-01-01 02:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val state = Seq(
      (10L, ts("2024-01-01 00:30:00"), "a"),
      (10L, ts("2024-01-01 02:00:00"), "b")
    ).toDF("user_id", "ts", "state")
    val a = AsOfJoin.asof(left, state, "user_id", "ts", "ts")
      .orderBy("event_id").collect().toSeq
    val b = AsOfJoin.asofDirectional(left, state, "user_id", "ts", "ts",
        forward = false).orderBy("event_id").collect().toSeq
    assert(a == b)
  }
}
