package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fromChangeLog splits runs on change and chains intervals") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "bronze"),
      (1L, ts("2024-01-03 00:00:00"), 3L, "gold"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "bronze"), // value recurs => NEW version
      (2L, ts("2024-01-01 12:00:00"), 5L, "silver")
    ).toDF("k", "t", "id", "v")
    val h = Scd2.fromChangeLog(log, Seq("k"), "t", Seq("id"), Seq("v"))
      .orderBy($"k", $"version")
      .as[(Long, Long, String, Timestamp, Option[Timestamp], Long)]
      .collect().toSeq
    assert(h == Seq(
      (1L, 1L, "bronze", ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), 2L),
      (1L, 2L, "gold", ts("2024-01-03 00:00:00"),
        Some(ts("2024-01-04 00:00:00")), 1L),
      (1L, 3L, "bronze", ts("2024-01-04 00:00:00"), None, 1L),
      (2L, 1L, "silver", ts("2024-01-01 12:00:00"), None, 1L)))
  }

  test("fromChangeLog treats NULL tracked values as a run of their own") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Option("a")),
      (1L, ts("2024-01-02 00:00:00"), 2L, Option.empty[String]),
      (1L, ts("2024-01-03 00:00:00"), 3L, Option.empty[String]),
      (1L, ts("2024-01-04 00:00:00"), 4L, Option("a"))
    ).toDF("k", "t", "id", "v")
    val h = Scd2.fromChangeLog(log, Seq("k"), "t", Seq("id"), Seq("v"))
      .orderBy($"version")
      .select($"version", $"v", $"n_events")
      .as[(Long, Option[String], Long)].collect().toSeq
    assert(h == Seq((1L, Some("a"), 1L), (2L, None, 2L), (3L, Some("a"), 1L)))
  }

  test("fromChangeLog ties break on the tie column at equal timestamps") {
    val t0 = ts("2024-01-01 00:00:00")
    val log = Seq((1L, t0, 2L, "b"), (1L, t0, 1L, "a")).toDF("k", "t", "id", "v")
    val h = Scd2.fromChangeLog(log, Seq("k"), "t", Seq("id"), Seq("v"))
      .orderBy($"version").select($"version", $"v")
      .as[(Long, String)].collect().toSeq
    assert(h == Seq((1L, "a"), (2L, "b")))
  }

  private val load = ts("2024-02-01 00:00:00")

  private def hist0 = Seq(
    // closed row: passes through untouched
    (1L, "bronze", ts("2024-01-01 00:00:00"), Option(ts("2024-01-05 00:00:00"))),
    // open rows
    (1L, "gold", ts("2024-01-05 00:00:00"), Option.empty[Timestamp]),
    (2L, "silver", ts("2024-01-02 00:00:00"), Option.empty[Timestamp]),
    (3L, "bronze", ts("2024-01-03 00:00:00"), Option.empty[Timestamp])
  ).toDF("k", "v", "valid_from", "valid_to")

  test("applySnapshot closes, carries, replaces, and inserts") {
    val snap = Seq(
      (1L, "gold"),     // unchanged -> carried
      (2L, "platinum"), // changed   -> close + reopen
      (4L, "bronze")    // new key   -> open; key 3 absent -> close
    ).toDF("k", "v")
    val out = Scd2.applySnapshot(hist0, snap, Seq("k"), Seq("v"), lit(load))
      .orderBy($"k", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(out == Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-01-05 00:00:00"))),
      (1L, "gold", ts("2024-01-05 00:00:00"), None),
      (2L, "silver", ts("2024-01-02 00:00:00"), Some(load)),
      (2L, "platinum", load, None),
      (3L, "bronze", ts("2024-01-03 00:00:00"), Some(load)),
      (4L, "bronze", load, None)))
  }

  test("applySnapshot with the current state is an identity") {
    val snap = hist0.filter($"valid_to".isNull).select($"k", $"v")
    val out = Scd2.applySnapshot(hist0, snap, Seq("k"), Seq("v"), lit(load))
      .orderBy($"k", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    val orig = hist0.orderBy($"k", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(out == orig)
  }

  test("applySnapshot agrees with fromChangeLog on a replayed log") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-10 00:00:00"), 2L, "b"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "x")
    ).toDF("k", "t", "id", "v")
    val whole = Scd2.fromChangeLog(log, Seq("k"), "t", Seq("id"), Seq("v"))
      .select($"k", $"v", $"valid_from", $"valid_to")
    val first = Scd2.fromChangeLog(
        log.filter($"t" < lit(ts("2024-01-10 00:00:00"))),
        Seq("k"), "t", Seq("id"), Seq("v"))
      .select($"k", $"v", $"valid_from", $"valid_to")
    val stepped = Scd2.applySnapshot(first,
      Seq((1L, "b")).toDF("k", "v").unionByName(Seq((2L, "x")).toDF("k", "v")),
      Seq("k"), Seq("v"), lit(ts("2024-01-10 00:00:00")))
    val a = whole.orderBy($"k", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    val b = stepped.orderBy($"k", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(a == b)
  }
}
