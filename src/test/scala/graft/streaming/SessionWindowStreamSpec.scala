package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the `q_session_native` claim: the identical
  * `groupBy(session_window(...))` code path runs under Structured
  * Streaming with a watermark, MERGING session state across micro-batches
  * (an event arriving in a later batch extends a session opened in an
  * earlier one), and emits a session only once its window is closed by
  * the watermark. */
class SessionWindowStreamSpec extends SparkSpec {
  import spark.implicits._

  private def sessionAgg(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("string").as("s"),
        col("session_window.end").cast("string").as("e"),
        col("n_events"))

  test("session_window merges state across micro-batches and equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val streamDf = mem.toDF().toDF("ts", "user_id")

    val q = sessionAgg(streamDf.withWatermark("ts", "0 seconds"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .start()

    def t(s: String) = Timestamp.valueOf(s)
    // batch 1 opens sessions; batch 2 EXTENDS user 1's first session
    // (00:30 < 00:10 + 30min) and opens a second for user 2
    val b1 = Seq((t("2024-01-01 00:00:00"), 1L),
      (t("2024-01-01 00:10:00"), 1L), (t("2024-01-01 00:05:00"), 2L))
    val b2 = Seq((t("2024-01-01 00:30:00"), 1L),
      (t("2024-01-01 02:00:00"), 2L))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    // nothing may emit yet: the watermark (02:00) hasn't passed 02:30
    // for user 2's open session, and user 1's closed at 01:00 — that
    // one IS emitted once the watermark passed its end
    val flush = Seq((t("2024-01-01 23:00:00"), 99L))
    mem.addData(flush: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_out")
      .as[(Long, String, String, Long)].collect().toSet
    // the flush user's own session never closes (watermark stops at its
    // event time) — compare against batch over the REAL rows only
    val batch = sessionAgg((b1 ++ b2).toDF("ts", "user_id"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // and the cross-batch merge really happened: user 1 has ONE session
    // of 3 events spanning both micro-batches
    assert(streamed.contains((1L, "2024-01-01 00:00:00",
      "2024-01-01 01:00:00", 3L)))
  }
}
