package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("counts consecutive pairs per entity; last events contribute nothing") {
    val ev = Seq(
      // u1: a -> b -> a (transitions a->b, b->a)
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "a"),
      // u2: a -> b (one transition a->b)
      (2L, ts("2024-01-01 10:00:00"), 4L, "a"),
      (2L, ts("2024-01-01 11:00:00"), 5L, "b"),
      // u3: single event, no transition
      (3L, ts("2024-01-01 10:00:00"), 6L, "a")
    ).toDF("u", "t", "id", "kind")
    val r = Transitions.matrix(ev, "u", "t", "id", "kind")
      .select($"from_type", $"to_type", $"n", $"p")
      .as[(String, String, Long, Double)].collect().toSet
    assert(r == Set(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("probabilities are conditional on the from state and sum to 1") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "a"),
      (1L, ts("2024-01-01 13:00:00"), 4L, "c"),
      (1L, ts("2024-01-01 14:00:00"), 5L, "a"),
      (1L, ts("2024-01-01 15:00:00"), 6L, "b")
    ).toDF("u", "t", "id", "kind")
    val r = Transitions.matrix(ev, "u", "t", "id", "kind")
      .select($"from_type", $"to_type", $"p")
      .as[(String, String, Double)].collect()
    val fromA = r.filter(_._1 == "a").map(x => (x._2, x._3)).toMap
    // a is followed by b twice, c once
    assert(fromA == Map("b" -> 2.0 / 3.0, "c" -> 1.0 / 3.0))
    val sums = r.groupBy(_._1).map { case (_, xs) => xs.map(_._3).sum }
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-15))
  }

  test("equal timestamps order by the tiebreak column") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq(
      (1L, t0, 2L, "b"),
      (1L, t0, 1L, "a")
    ).toDF("u", "t", "id", "kind")
    val r = Transitions.matrix(ev, "u", "t", "id", "kind")
      .select($"from_type", $"to_type").as[(String, String)].collect().toSeq
    assert(r == Seq(("a", "b")))
  }

  test("entities do not leak transitions into each other") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 11:00:00"), 2L, "b")
    ).toDF("u", "t", "id", "kind")
    assert(Transitions.matrix(ev, "u", "t", "id", "kind").count() == 0L)
  }
}
