package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, LongType, StringType}

import graft.SparkSpec

class JsonLinesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def tmp(name: String) =
    Files.createTempDirectory(s"jsonl_$name").resolve("data").toString

  test("roundtrip preserves newlines, quotes, unicode, and nulls") {
    val rows = Seq(
      (1L, "plain"),
      (2L, "line one\nline two\twith tab"),
      (3L, """quotes " and \ backslash"""),
      (4L, "ação, 日本語, emoji 😀"),
      (5L, null)
    )
    val path = tmp("rt")
    JsonLines.write(rows.toDF("id", "text"), path)
    val back = JsonLines.readClean(spark, path, schema)
      .as[(Long, Option[String])].collect().toSet
    assert(back == rows.map { case (i, t) => (i, Option(t)) }.toSet)
  }

  test("a torn line quarantines into the corrupt column, not a crash") {
    val path = tmp("corrupt")
    JsonLines.write(Seq((1L, "good")).toDF("id", "text"), path)
    // append a malformed line next to the real part files
    val dir = Paths.get(path)
    Files.write(dir.resolve("part-zz-torn.json"),
      "{\"id\": 2, \"text\": \"truncat".getBytes("UTF-8"))
    // collect data columns alongside the corrupt one: Spark rejects
    // plans that reference ONLY the corrupt-record column
    val all = JsonLines.read(spark, path, schema).collect()
    assert(all.count(r =>
      !r.isNullAt(r.fieldIndex(JsonLines.CorruptCol))) == 1)
    val clean = JsonLines.readClean(spark, path, schema)
      .as[(Long, String)].collect().toSeq
    assert(clean == Seq((1L, "good")))
  }

  test("gzip-compressed write reads back identically") {
    val rows = (1L to 100L).map(i => (i, s"doc $i\nsecond line"))
    val path = tmp("gz")
    JsonLines.write(rows.toDF("id", "text"), path, Some("gzip"))
    assert(JsonLines.readClean(spark, path, schema).count() == 100L)
  }

  test("write is distributed: one file per partition, no coalesce(1)") {
    val path = tmp("parts")
    JsonLines.write(
      spark.range(0, 1000).repartition(8)
        .select(col("id"), concat(lit("t"), col("id")).as("text")), path)
    val parts = Files.list(Paths.get(path)).toArray.map(_.toString)
      .count(p => p.contains("part-") && !p.endsWith(".crc"))
    assert(parts == 8, s"expected 8 part files, got $parts")
  }
}
