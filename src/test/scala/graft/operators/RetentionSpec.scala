package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("entities land in their first-activity cohort with offsets") {
    val ev = Seq(
      // u1: cohort day 0 (epoch day of 2024-01-01), back 2 periods later
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-03 09:00:00")),
      // u2: same cohort, never returns
      (2L, ts("2024-01-01 23:00:00")),
      // u3: cohort one day later, returns next day
      (3L, ts("2024-01-02 01:00:00")),
      (3L, ts("2024-01-03 01:00:00"))
    ).toDF("u", "t")
    val r = Retention.cohorts(ev, "u", "t", periodDays = 1)
      .select($"cohort_period" % 100, $"period_offset", $"n_active")
      .as[(Long, Long, Long)].collect().toSet
    val day0 = ts("2024-01-01 00:00:00").getTime / 86400000L % 100
    assert(r == Set(
      (day0, 0L, 2L), (day0, 2L, 1L),
      (day0 + 1, 0L, 1L), (day0 + 1, 1L, 1L)))
  }

  test("multiple events in one period count once") {
    val ev = Seq(
      (1L, ts("2024-01-01 01:00:00")),
      (1L, ts("2024-01-01 02:00:00")),
      (1L, ts("2024-01-01 03:00:00"))
    ).toDF("u", "t")
    val r = Retention.cohorts(ev, "u", "t", periodDays = 7)
      .select($"period_offset", $"n_active").as[(Long, Long)].collect().toSeq
    assert(r == Seq((0L, 1L)))
  }

  test("pre-epoch timestamps floor to negative periods") {
    // truncating DIV would collapse 1969-12-31 into period 0 alongside
    // 1970-01-01; floor division keeps it one period earlier
    val ev = Seq(
      (1L, ts("1969-12-31 12:00:00")),
      (1L, ts("1970-01-01 12:00:00"))
    ).toDF("u", "t")
    val r = Retention.cohorts(ev, "u", "t", periodDays = 1)
      .select($"cohort_period", $"period_offset", $"n_active")
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((-1L, 0L, 1L), (-1L, 1L, 1L)))
  }

  test("single-period cohort yields exactly one offset-0 row") {
    // every event of every user lands in the same 7-day period (the
    // epoch-anchored period containing 2023-12-28..2024-01-03): the
    // whole triangle degenerates to one (cohort, 0, n_users) row
    val ev = Seq(
      (1L, ts("2024-01-01 01:00:00")),
      (1L, ts("2024-01-03 02:00:00")),
      (2L, ts("2024-01-02 03:00:00")),
      (3L, ts("2024-01-03 04:00:00"))
    ).toDF("u", "t")
    val r = Retention.cohorts(ev, "u", "t", periodDays = 7)
      .select($"period_offset", $"n_active").as[(Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3L)))
  }

  test("offset-0 counts equal cohort sizes") {
    val ev = (1L to 50L).map(i =>
      (i, ts(f"2024-01-${i % 9 + 1}%02d 12:00:00"))).toDF("u", "t")
    val r = Retention.cohorts(ev, "u", "t", periodDays = 3)
    val zeroSum = r.filter($"period_offset" === 0)
      .agg(org.apache.spark.sql.functions.sum($"n_active"))
      .as[Long].head()
    assert(zeroSum == 50L)
  }
}
