package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def spans(rows: Seq[(Long, Timestamp, Timestamp)]) =
    Intervals.merge(rows.toDF("k", "s", "e"), "k", "s", "e")
      .select(col("k"), col("island"), col("span_start"), col("span_end"),
        col("n_rows"))
      .as[(Long, Long, Timestamp, Timestamp, Long)]
      .collect().toSet

  test("overlapping and touching intervals merge; gaps split islands") {
    val out = spans(Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00")), // overlap
      (1L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")), // touching
      (1L, ts("2024-01-01 06:00:00"), ts("2024-01-01 07:00:00")), // gap
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"))  // other key
    ))
    assert(out == Set(
      (1L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 04:00:00"), 3L),
      (1L, 2L, ts("2024-01-01 06:00:00"), ts("2024-01-01 07:00:00"), 1L),
      (2L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 1L)))
  }

  test("contained interval does not shorten the running span") {
    // [0,10] then [1,2]: running max end must stay 10, so [3,4] merges too.
    val out = spans(Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")),
      (1L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00"))
    ))
    assert(out == Set(
      (1L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 10:00:00"), 3L)))
  }

  test("degenerate end < start is clamped to a point interval") {
    val out = spans(Seq(
      (1L, ts("2024-01-01 05:00:00"), ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 05:30:00"), ts("2024-01-01 06:00:00"))
    ))
    // clamped to [05:00, 05:00]; next starts 05:30 > 05:00 -> two islands
    assert(out == Set(
      (1L, 1L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:00"), 1L),
      (1L, 2L, ts("2024-01-01 05:30:00"), ts("2024-01-01 06:00:00"), 1L)))
  }

  test("duplicate (start,end) ties land in the same island deterministically") {
    val out = spans(Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (1L, ts("2024-01-01 02:00:00"), ts("2024-01-01 03:00:00"))
    ))
    assert(out == Set(
      (1L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 2L),
      (1L, 2L, ts("2024-01-01 02:00:00"), ts("2024-01-01 03:00:00"), 1L)))
  }

  test("maxConcurrency counts inclusive overlap peaks per key") {
    val df = Seq(
      // key 1: [0,2],[1,3],[2,4] -> at t=2 all three active (inclusive)
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00")),
      (1L, ts("2024-01-01 02:00:00"), ts("2024-01-01 04:00:00")),
      // key 2: touching [0,1],[1,2] -> inclusive ends overlap at t=1
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (2L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")),
      // key 3: disjoint
      (3L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (3L, ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00"))
    ).toDF("k", "s", "e")
    val out = Intervals.maxConcurrency(df, "k", "s", "e")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("plan: single Exchange feeds both window passes") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00"))
    ).toDF("k", "s", "e")
    val plan = Intervals.merge(df, "k", "s", "e")
      .queryExecution.executedPlan.toString
    // Two exchanges total: one hash partition on k for the windows, one
    // for the (k, island) aggregation — the two windows must share a sort.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$plan")
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts <= 1, s"expected the windows to share one sort:\n$plan")
  }

  private def iv(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("k", "s", "e")

  private def sub(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)]) =
    Intervals.subtract(iv(a), iv(b), "k", "s", "e")
      .select("k", "island", "span_start", "span_end")
      .as[(Long, Long, Long, Long)].collect().toSet

  private def inter(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)]) =
    Intervals.intersect(iv(a), iv(b), "k", "s", "e")
      .select("k", "island", "span_start", "span_end")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("subtract punches a hole: [0,10) minus [3,5)") {
    assert(sub(Seq((1L, 0L, 10L)), Seq((1L, 3L, 5L))) == Set(
      (1L, 1L, 0L, 3L), (1L, 2L, 5L, 10L)))
  }

  test("subtract with empty B merges touching A spans (half-open)") {
    assert(sub(Seq((1L, 0L, 5L), (1L, 5L, 10L)), Seq.empty) == Set(
      (1L, 1L, 0L, 10L)))
  }

  test("subtrahend touching only at the boundary removes nothing") {
    assert(sub(Seq((1L, 0L, 5L)), Seq((1L, 5L, 10L))) == Set(
      (1L, 1L, 0L, 5L)))
  }

  test("full cover subtracts to empty; keys are independent") {
    assert(sub(
      Seq((1L, 2L, 8L), (2L, 0L, 4L)),
      Seq((1L, 0L, 10L))) == Set((2L, 1L, 0L, 4L)))
  }

  test("overlapping subtrahends combine; degenerate rows drop out") {
    // B = [2,5) u [4,8) covers [2,8); degenerate A (9,9) covers nothing.
    assert(sub(
      Seq((1L, 0L, 10L), (1L, 9L, 9L)),
      Seq((1L, 2L, 5L), (1L, 4L, 8L))) == Set(
      (1L, 1L, 0L, 2L), (1L, 2L, 8L, 10L)))
  }

  test("intersect: [0,10) with [5,15) and a disjoint B span") {
    assert(inter(
      Seq((1L, 0L, 10L)),
      Seq((1L, 5L, 15L), (1L, 20L, 25L))) == Set((1L, 1L, 5L, 10L)))
  }

  test("intersect of boundary-touching spans is empty") {
    assert(inter(Seq((1L, 0L, 5L)), Seq((1L, 5L, 10L))).isEmpty)
  }

  test("subtract plan: one sort, no join") {
    val plan = Intervals.subtract(iv(Seq((1L, 0L, 10L))),
        iv(Seq((1L, 3L, 5L))), "k", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"sweep must not join:\n$plan")
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts <= 1, s"all sweep windows must share one sort:\n$plan")
  }
}
