package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamingSyncSpec extends SparkSpec {
  import spark.implicits._

  test("windowedCounts over a memory stream equals the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")

    val agg = StreamingSync.windowedCounts(
      streamDf, "ts", "5 minutes", "10 minutes", Seq("event_type"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_out")
      .start()

    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "view", 3.0))
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_out")
      .select(col("window.start").cast("string"), col("event_type"), col("n"),
        col("sum_value").cast("string"))
      .as[(String, String, Long, String)].collect().toSet

    val batch = StreamingSync.windowedCounts(
        rows.toDF("ts", "event_type", "value"), "ts", "5 minutes",
        "10 minutes", Seq("event_type"))
      .select(col("window.start").cast("string"), col("event_type"), col("n"),
        col("sum_value").cast("string"))
      .as[(String, String, Long, String)].collect().toSet

    assert(streamed == batch)
    assert(streamed.size == 2)
  }

  test("mergeStream upserts micro-batches into the destination path") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val destPath = s"$tmp/dest"
    // seed destination
    Seq((1L, "old"), (2L, "old")).toDF("id", "v")
      .write.parquet(destPath)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingSync.mergeStream(
      mem.toDF().toDF("id", "v"), destPath, Seq("id"), s"$tmp/ckpt").start()
    mem.addData((2L, "new"), (3L, "new"))
    q.processAllAvailable()
    q.stop()

    val merged = spark.read.parquet(destPath)
      .as[(Long, String)].collect().toMap
    assert(merged == Map(1L -> "old", 2L -> "new", 3L -> "new"))
  }
}
