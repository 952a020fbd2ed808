package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val steps = Seq("view", "click", "buy")

  test("steps must happen strictly in order to count") {
    val ev = Seq(
      // u1 completes all three in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "buy"),
      // u2 clicked BEFORE viewing: click does not count, stuck at view
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3 never viewed: absent from the funnel entirely
      (3L, ts("2024-01-01 10:00:00"), "click"),
      (3L, ts("2024-01-01 11:00:00"), "buy")
    ).toDF("u", "t", "kind")
    val f = Funnel.earliest(ev, "u", "t", "kind", steps)
      .select($"u", $"steps_completed").as[(Long, Long)].collect().toMap
    assert(f == Map(1L -> 3L, 2L -> 1L))
  }

  test("a later qualifying occurrence rescues an early out-of-order step") {
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), "click"), // too early
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click") // counts
    ).toDF("u", "t", "kind")
    val f = Funnel.earliest(ev, "u", "t", "kind", steps)
      .select($"t1", $"t2", $"t3")
      .as[(Timestamp, Option[Timestamp], Option[Timestamp])].head()
    assert(f._1 == ts("2024-01-01 10:00:00"))
    assert(f._2.contains(ts("2024-01-01 11:00:00")) && f._3.isEmpty)
  }

  test("equal timestamps are not strictly after") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq((1L, t0, "view"), (1L, t0, "click")).toDF("u", "t", "kind")
    val f = Funnel.earliest(ev, "u", "t", "kind", steps)
      .select($"steps_completed").as[Long].head()
    assert(f == 1L)
  }

  test("entities with ONLY later-step events never enter the funnel") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "buy"),
      (2L, ts("2024-01-01 10:00:00"), "buy")
    ).toDF("u", "t", "kind")
    val f = Funnel.earliest(ev, "u", "t", "kind", steps)
    assert(f.count() == 0L,
      "a funnel row requires step 1; later-step-only entities must be absent")
  }

  test("earliest completion is picked per step") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 10:30:00"), "click")
    ).toDF("u", "t", "kind")
    val f = Funnel.earliest(ev, "u", "t", "kind", steps)
      .select($"t2").as[Option[Timestamp]].head()
    assert(f.contains(ts("2024-01-01 10:30:00")))
  }
}
