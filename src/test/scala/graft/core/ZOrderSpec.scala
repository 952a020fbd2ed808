package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a even, b odd)") {
    val out = Seq((3L, 0L), (0L, 3L), (5L, 3L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect()
    assert(out(0) === 0x5L)  // a=0b11 -> 0101
    assert(out(1) === 0xAL)  // b=0b11 -> 1010
    // a=0b101 (even bits 10001), b=0b011 (odd bits 01010) -> 0b11011
    assert(out(2) === 27L)
  }

  test("zValue3 interleaves three axes at stride 3 (a→3i, b→3i+1, c→3i+2)") {
    val out = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
        (0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL), (5L, 3L, 1L))
      .toDF("a", "b", "c")
      .select(ZOrder.zValue3(col("a"), col("b"), col("c"))).as[Long].collect()
    assert(out(0) === 1L && out(1) === 2L && out(2) === 4L)
    assert(out(3) === Long.MaxValue)       // 63 set bits = full budget
    // a=0b101 -> bits 0,6; b=0b011 -> bits 1,4; c=0b001 -> bit 2
    assert(out(4) === ((1L << 0) | (1L << 6) | (1L << 1) | (1L << 4) | (1L << 2)))
  }

  test("bin maps bounds to [0, 2^bits) and clamps outliers") {
    val out = Seq(0.0, 50.0, 100.0, -5.0, 200.0).toDF("v")
      .select(ZOrder.bin(col("v"), 0.0, 100.0, 4)).as[Long].collect()
    assert(out(0) === 0L && out(2) === 15L)
    assert(out(1) === 7L)            // 50/100 * 15 = 7.5 -> floor 7
    assert(out(3) === 0L && out(4) === 15L) // clamped
  }

  test("z-order layout localizes BOTH dimensions' file min-max envelopes") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "value")
    val (uMin, uMax, vMin, vMax) = events
      .agg(min("user_id"), max("user_id"), min("value"), max("value"))
      .as[(Long, Long, Double, Double)].head()

    def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dir = Files.createTempDirectory("graft-zorder").toString
      df.write.mode("overwrite").parquet(dir)
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max("user_id") - min("user_id")) / lit((uMax - uMin).toDouble)).as("us"),
          ((max("value") - min("value")) / lit(vMax - vMin)).as("vs"))
        .agg(avg("us"), avg("vs")).as[(Double, Double)].head()
      spans
    }

    // single-column clustering: perfect on user_id, useless on value
    val (suSpan, svSpan) = meanSpans(
      events.repartitionByRange(8, col("user_id"))
        .sortWithinPartitions("user_id"))
    // z-order: good on both
    val (zuSpan, zvSpan) = meanSpans(ZOrder.layout(
      events, "user_id", (uMin.toDouble, uMax.toDouble),
      "value", (vMin, vMax), partitions = 8))

    assert(suSpan < 0.2, s"sanity: single-sort localizes user_id ($suSpan)")
    assert(svSpan > 0.7, s"sanity: single-sort leaves value unlocalized ($svSpan)")
    assert(zvSpan < 0.6 * svSpan,
      s"z-order must localize value: z=$zvSpan vs sorted=$svSpan")
    assert(zuSpan < 0.7,
      s"z-order must keep user_id partially localized: $zuSpan")
  }
}
