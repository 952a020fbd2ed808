package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1 to 300).map { i =>
    (i.toLong, 2020 + (i % 3), s"v$i")
  }

  test("round-trips data and prunes partitions at planning time") {
    val dir = Files.createTempDirectory("pl_spec").toFile.getAbsolutePath
    PartitionedLayout.writePartitioned(
      rows.toDF("id", "yr", "v"), dir, Seq("yr"))

    val back = PartitionedLayout.read(spark, dir)
    assert(back.count() == 300)

    val q = back.filter(col("yr") === 2021)
    assert(q.count() == rows.count(_._2 == 2021))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert("PartitionFilters: \\[[^\\]]*yr".r.findFirstIn(plan).nonEmpty,
      s"year filter must prune partitions, not just rows:\n$plan")
  }

  test("one file per partition directory") {
    val dir = Files.createTempDirectory("pl_files").toFile.getAbsolutePath
    PartitionedLayout.writePartitioned(
      rows.toDF("id", "yr", "v"), dir, Seq("yr"))
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("yr="))
    assert(partDirs.length == 3, partDirs.map(_.getName).mkString(","))
    partDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
  }

  test("maxRecordsPerFile rolls large partitions into multiple files") {
    val dir = Files.createTempDirectory("pl_roll").toFile.getAbsolutePath
    // 100 rows per yr, 40-row file budget -> 3 files per partition dir
    PartitionedLayout.writePartitioned(
      rows.toDF("id", "yr", "v"), dir, Seq("yr"), maxRecordsPerFile = 40L)
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("yr="))
    val counts = partDirs.map(_.listFiles()
      .count(_.getName.endsWith(".parquet")))
    assert(counts.forall(_ == 3), counts.mkString(","))
    assert(PartitionedLayout.read(spark, dir).count() == 300)
  }

  test("overwrite replaces a previous layout") {
    val dir = Files.createTempDirectory("pl_ow").toFile.getAbsolutePath
    PartitionedLayout.writePartitioned(
      rows.toDF("id", "yr", "v"), dir, Seq("yr"))
    PartitionedLayout.writePartitioned(
      rows.take(10).toDF("id", "yr", "v"), dir, Seq("yr"))
    assert(PartitionedLayout.read(spark, dir).count() == 10)
  }
}
