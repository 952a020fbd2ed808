package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dedupForever drops duplicate content across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = DedupStream.dedupForever(
      mem.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()

    mem.addData((1L, "alpha beta"), (2L, "gamma"))
    q.processAllAvailable()
    // batch 2: exact dup of 1 (different id), whitespace/case variant of
    // 2 (same normalized fingerprint), and one genuinely new doc
    mem.addData((3L, "alpha beta"), (4L, "  GAMMA "), (5L, "delta"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 5L))
  }

  test("dedupWithinWatermark drops in-window dups and bounds state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = DedupStream.dedupWithinWatermark(
      mem.toDF().toDF("doc_id", "text", "event_ts"), "text", "event_ts",
      "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()

    mem.addData(
      (1L, "doc one", ts("2024-01-01 00:00:00")),
      (2L, "doc one", ts("2024-01-01 00:05:00"))) // dup inside window
    q.processAllAvailable()
    // advance the watermark far past the first fingerprint's state...
    mem.addData((3L, "doc two", ts("2024-01-01 02:00:00")))
    q.processAllAvailable()
    // ...then the same content again: state was evicted, so it passes
    // (the documented horizon semantics — batch sweep catches it later)
    mem.addData((4L, "doc one", ts("2024-01-01 02:01:00")))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_wm_out").select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L) && !ids.contains(2L), "in-window dup must drop")
    assert(ids.contains(3L))
    assert(ids.contains(4L), "post-eviction repeat should pass (horizon semantics)")
  }
}
