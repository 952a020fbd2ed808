package graft.operators

import graft.SparkSpec

class SeqMineSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_id", "event_type")

  test("contiguous length-2 patterns count overlapping occurrences") {
    // user 1: a b a b → a→b ×2, b→a ×1
    val df = ev((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (1L, 3L, 3L, "a"), (1L, 4L, 4L, "b"))
    val out = SeqMine.topSequences(df, "user_id", "ts", "event_id",
      "event_type", len = 2)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("a", "b")) === ((2L, 1L)))
    assert(out(("b", "a")) === ((1L, 1L)))
  }

  test("patterns never cross users; support counts distinct users") {
    val df = ev((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"),
      (2L, 1L, 4L, "a"), (2L, 2L, 5L, "b"), (2L, 3L, 6L, "c"),
      (3L, 1L, 7L, "c"), (3L, 2L, 8L, "a")) // c,a crosses nothing
    val out = SeqMine.topSequences(df, "user_id", "ts", "event_id",
      "event_type", len = 3)
      .as[(String, String, String, Long, Long)].collect()
    assert(out.toSeq === Seq(("a", "b", "c", 2L, 2L)))
  }

  test("minUsers filters low-support patterns") {
    val df = ev((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (2L, 1L, 3L, "b"), (2L, 2L, 4L, "a"))
    val out = SeqMine.topSequences(df, "user_id", "ts", "event_id",
      "event_type", len = 2, minUsers = 2L)
    assert(out.count() === 0)
  }

  test("ties broken by the tie column, not arrival order") {
    val df = ev((1L, 5L, 2L, "b"), (1L, 5L, 1L, "a"), (1L, 6L, 3L, "c"))
    val out = SeqMine.topSequences(df, "user_id", "ts", "event_id",
      "event_type", len = 3)
      .as[(String, String, String, Long, Long)].collect()
    assert(out.toSeq === Seq(("a", "b", "c", 1L, 1L)))
  }
}
