package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.load(
    spark, "/root/testdata/sf0.001", "documents", parallelize = false)
    .select("doc_id", "text", "lang")

  test("export produces the requested shard count, all rows, in order") {
    val out = Files.createTempDirectory("graft_export").toString
    TrainingExport.exportJsonl(docs, out, shards = 3, orderCol = "doc_id")
    val lines = spark.read.format("text").load(out)
      .select(input_file_name().as("f"), col("value"))
    assert(lines.select("f").distinct().count() == 3)
    assert(lines.count() == docs.count())
    // in-shard ordering: doc_id is non-decreasing within every file
    val disorder = lines
      .select(col("f"),
        get_json_object(col("value"), "$.doc_id").cast("long").as("id"))
      .withColumn("prev", lag("id", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev").isNotNull && col("prev") > col("id"))
    assert(disorder.count() == 0)
    // every row round-trips as JSON with its fields intact
    val back = spark.read.json(out)
    assert(back.select("doc_id", "text", "lang").except(docs).count() == 0)
  }

  test("re-export of the same input is manifest-identical (deterministic)") {
    val a = Files.createTempDirectory("graft_export_a").toString
    val b = Files.createTempDirectory("graft_export_b").toString
    TrainingExport.exportJsonl(docs, a, shards = 4, orderCol = "doc_id")
    TrainingExport.exportJsonl(docs, b, shards = 4, orderCol = "doc_id")
    def m(p: String) = TrainingExport.manifest(spark, p)
      .select("n_rows", "checksum").as[(Long, BigDecimal)].collect().toSet
    assert(m(a) == m(b))
    assert(m(a).map(_._1).sum == docs.count())
  }

  test("writeManifest lands _MANIFEST.json that Spark readers skip") {
    val out = Files.createTempDirectory("graft_export_m").toString
    TrainingExport.exportJsonl(docs, out, shards = 2, orderCol = "doc_id")
    TrainingExport.writeManifest(spark, out)
    val manifestFile = new java.io.File(out, "_MANIFEST.json")
    assert(manifestFile.exists())
    val text = new String(Files.readAllBytes(manifestFile.toPath), "UTF-8")
    assert(text.contains("\"n_rows\"") && text.contains("\"checksum\""))
    // underscore file is invisible to the JSON reader: row count unchanged
    assert(spark.read.json(out).count() == docs.count())
  }

  test("verifyExport passes a clean delivery and catches every tamper kind") {
    val out = Files.createTempDirectory("graft_export_v").toString
    TrainingExport.exportJsonl(docs, out, shards = 2, orderCol = "doc_id")
    TrainingExport.writeManifest(spark, out)
    assert(TrainingExport.verifyExport(spark, out).isEmpty)

    // corrupt ONE line in one shard without changing the line count —
    // only the content checksum can notice
    val shard = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".json")).minBy(_.getName)
    val lines = Files.readAllLines(shard.toPath)
    lines.set(0, lines.get(0).replaceFirst("\\{", "{\"__corrupt\":1,"))
    Files.write(shard.toPath, lines)
    // drop RawLocalFileSystem's CRC sidecar so the tamper reaches the
    // manifest layer (object stores have no such sidecar)
    new java.io.File(out, s".${shard.getName}.crc").delete()
    val bad = TrainingExport.verifyExport(spark, out)
      .select("shard", "status").as[(String, String)].collect().toSeq
    assert(bad == Seq((shard.getName, "checksum_mismatch")))

    // a shard the manifest doesn't know, and a manifest entry with no
    // file behind it (both directions of the compare)
    Files.write(new java.io.File(out, "part-rogue.json").toPath,
      java.util.List.of("""{"doc_id":-1}"""))
    assert(shard.delete())
    val statuses = TrainingExport.verifyExport(spark, out)
      .select("shard", "status").as[(String, String)].collect().toMap
    assert(statuses(shard.getName) == "missing_shard")
    assert(statuses("part-rogue.json") == "unexpected_shard")
    assert(statuses.size == 2)
  }

  test("verifyExport fails a manifest entry with a nulled checksum") {
    // a null field must FAIL verification (null-safe compare), never
    // null out the status chain and report the export clean
    val out = Files.createTempDirectory("graft_export_nc").toString
    TrainingExport.exportJsonl(docs, out, shards = 2, orderCol = "doc_id")
    TrainingExport.writeManifest(spark, out)
    val mf = new java.io.File(out, "_MANIFEST.json")
    val text = new String(Files.readAllBytes(mf.toPath), "UTF-8")
    Files.write(mf.toPath,
      text.replaceFirst("\"checksum\":-?\\d+", "\"checksum\":null")
        .getBytes("UTF-8"))
    new java.io.File(out, "._MANIFEST.json.crc").delete()
    val statuses = TrainingExport.verifyExport(spark, out)
      .select("status").as[String].collect().toSeq
    assert(statuses == Seq("checksum_mismatch"))
  }

  test("gzip export round-trips") {
    val out = Files.createTempDirectory("graft_export_gz").toString
    TrainingExport.exportJsonl(docs, out, shards = 2, orderCol = "doc_id",
      compress = true)
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.endsWith(".json.gz")))
    assert(spark.read.json(out).count() == docs.count())
  }
}
