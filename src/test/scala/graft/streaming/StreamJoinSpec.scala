package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("attribution pairs match across micro-batch boundaries, once each") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamJoin.attributionJoin(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      purchases.toDF().toDF("p_user", "purchase_id", "purchase_ts"),
      "user_id", "p_user", "click_ts", "purchase_ts",
      window = "30 minutes", watermarkDelay = "1 hour")
      .select("user_id", "click_id", "purchase_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()

    // batch 1: a click with no purchase yet — pair must wait in state
    clicks.addData((7L, 100L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // batch 2: in-window purchase (cross-batch match), out-of-window
    // purchase, and a purchase BEFORE the click (must not match)
    purchases.addData(
      (7L, 500L, ts("2024-01-01 10:20:00")),  // within 30 min -> pair
      (7L, 501L, ts("2024-01-01 11:30:00")),  // past the window
      (7L, 502L, ts("2024-01-01 09:50:00")))  // before the click
    q.processAllAvailable()
    // batch 3: same-batch match for another user
    clicks.addData((8L, 101L, ts("2024-01-01 12:00:00")))
    purchases.addData((8L, 503L, ts("2024-01-01 12:05:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attr_out")
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(rows == Seq((7L, 100L, 500L), (8L, 101L, 503L)))
  }

  test("watermark evicts join state and drops too-late rows") {
    // the operator's core claim (StreamJoin scaladoc): state is evicted as
    // the watermark passes, so it tracks rate x (window + delay), not
    // stream length. Observed here, not assumed: a tight 10-second delay,
    // a watermark pushed 2 hours forward, then a purchase 10:02 that WOULD
    // pair with the 10:00 click in the batch join — the streaming join
    // must have already evicted that click and must drop the late row.
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamJoin.attributionJoin(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      purchases.toDF().toDF("p_user", "purchase_id", "purchase_ts"),
      "user_id", "p_user", "click_ts", "purchase_ts",
      window = "10 minutes", watermarkDelay = "10 seconds")
      .select("user_id", "click_id", "purchase_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_evict_out").start()

    // batch 1: an in-window pair at 10:00 — both rows enter join state
    clicks.addData((1L, 100L, ts("2024-01-01 10:00:00")))
    purchases.addData((1L, 500L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    val afterLoad = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    // batch 2: both streams jump to 12:00 — end-of-batch watermark
    // advances to ~11:59:50, far past the 10:00 state
    clicks.addData((2L, 101L, ts("2024-01-01 12:00:00")))
    purchases.addData((2L, 501L, ts("2024-01-01 12:01:00")))
    q.processAllAvailable()
    // batch 3: a late purchase that is in-window for click 100 — batch
    // semantics would pair it; the stream must drop it (its event time is
    // 2 hours behind the watermark) and evict the 10:00/10:05 state
    purchases.addData((1L, 502L, ts("2024-01-01 10:02:00")))
    q.processAllAvailable()
    val finalState = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    q.stop()

    val rows = spark.table("attr_evict_out")
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // the late pair (1, 100, 502) must NOT appear
    assert(rows == Seq((1L, 100L, 500L), (2L, 101L, 501L)))
    assert(afterLoad >= 2, s"batch-1 pair never entered join state ($afterLoad)")
    assert(removed > 0, "watermark passing evicted nothing")
    // only the two 12:00 rows may remain — the 10:00/10:05 rows are gone
    // and the dropped late row never entered state
    assert(finalState <= 2,
      s"state grew past the watermark bound: $finalState rows retained")
  }

  test("streaming result equals the batch join on the same data") {
    implicit val sqlCtx = spark.sqlContext
    // one event every 9 minutes, users round-robin: click i pairs with
    // purchase i+5 (same user, 45 minutes later — exactly on the bound)
    val base = java.time.LocalDateTime.of(2024, 1, 1, 8, 0)
    val events = (0 until 40).map { i =>
      (i % 5L, i.toLong,
        java.sql.Timestamp.valueOf(base.plusMinutes(9L * i)),
        if (i % 2 == 0) "click" else "purchase")
    }
    val batchDf = events.toDF("user_id", "event_id", "ts", "kind")
    val bClicks = batchDf.filter($"kind" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val bPurch = batchDf.filter($"kind" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"))
    val expected = StreamJoin.attributionJoin(bClicks, bPurch,
        "user_id", "p_user", "click_ts", "purchase_ts", "45 minutes", "1 hour")
      .select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet

    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val src = mem.toDF().toDF("user_id", "event_id", "ts", "kind")
    val joined = StreamJoin.attributionJoin(
      src.filter($"kind" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts")),
      src.filter($"kind" === "purchase")
        .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
          $"ts".as("purchase_ts")),
      "user_id", "p_user", "click_ts", "purchase_ts", "45 minutes", "1 hour")
      .select("click_id", "purchase_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_eq_out").start()
    events.grouped(13).foreach { g => mem.addData(g); q.processAllAvailable() }
    q.stop()

    val got = spark.table("attr_eq_out")
      .as[(Long, Long)].collect()
    assert(got.toSet == expected)
    assert(got.length == got.toSet.size, "every pair emitted exactly once")
    assert(expected.nonEmpty)
  }

  test("left-outer join emits unmatched rows null-padded, only after " +
      "the watermark proves no partner can come") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamJoin.attributionJoinOuter(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      purchases.toDF().toDF("p_user", "purchase_id", "purchase_ts"),
      "user_id", "p_user", "click_ts", "purchase_ts",
      window = "10 minutes", watermarkDelay = "10 seconds")
      .select("user_id", "click_id", "purchase_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_outer_out").start()

    // batch 1: a click that will convert and one that will not
    clicks.addData(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 101L, ts("2024-01-01 10:00:00")))
    purchases.addData((1L, 500L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    val early = spark.table("attr_outer_out")
      .select("click_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toSet
    // the matched pair may stream out, but the unmatched click must NOT
    // be declared unconverted yet — its window is still open
    assert(!early.contains((101L, None)),
      s"null-padded row emitted before the watermark closed it: $early")

    // batch 2: both streams advance far past the window + delay — the
    // watermark now proves click 101 can never match
    clicks.addData((3L, 102L, ts("2024-01-01 12:00:00")))
    purchases.addData((3L, 501L, ts("2024-01-01 12:01:00")))
    q.processAllAvailable()
    // outer results are emitted on state eviction, which some Spark
    // versions finalize one trigger later — nudge with an empty-ish batch
    clicks.addData((4L, 103L, ts("2024-01-01 13:00:00")))
    purchases.addData((4L, 502L, ts("2024-01-01 13:00:30")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attr_outer_out")
      .select("click_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toSet
    assert(rows.contains((100L, Some(500L))), s"matched pair missing: $rows")
    assert(rows.contains((101L, None)),
      s"unmatched click never surfaced null-padded: $rows")
    assert(!rows.contains((100L, None)),
      s"matched click must not ALSO emit a null row: $rows")
  }
}
