package graft.core

import java.nio.file.Files

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("compact").resolve("t").toString

  test("many small files collapse to the size-targeted count, data intact") {
    val dir = freshDir()
    val df = (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    df.repartition(40).write.parquet(dir)
    val (before, bytes, after) = Compaction.compact(spark, dir,
      targetBytes = bytesOf(dir) / 3)
    assert(before == 40)
    assert(after <= 4 && after >= 1, s"got $after files")
    assert(bytes > 0)
    val back = AtomicParquet.read(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(back == (1 to 5000).map(i => (i.toLong, s"row$i")).toSet)
  }

  test("compacting a compacted directory is stable (idempotent)") {
    val dir = freshDir()
    (1 to 100).map(i => (i.toLong, i.toString)).toDF("id", "v")
      .repartition(10).write.parquet(dir)
    val (_, _, after1) = Compaction.compact(spark, dir)
    val (before2, _, after2) = Compaction.compact(spark, dir)
    assert(after1 == 1 && before2 == 1 && after2 == 1)
  }

  test("recluster compacts AND restores two-column file locality") {
    val dir = freshDir()
    // interleaved appends: each file spans the FULL range of both
    // columns — worst case for min-max stats
    (0 until 8).foreach { _ =>
      (0 until 1000).map(i => (i.toDouble, (i * 37 % 1000).toDouble))
        .toDF("x", "y").coalesce(1).write.mode("append").parquet(dir)
    }
    def meanSpans(): (Double, Double) = {
      val rows = spark.read.parquet(dir)
        .groupBy(org.apache.spark.sql.functions.input_file_name())
        .agg(org.apache.spark.sql.functions.expr("max(x) - min(x)"),
          org.apache.spark.sql.functions.expr("max(y) - min(y)"))
        .collect()
      (rows.map(_.getDouble(1)).sum / rows.length,
        rows.map(_.getDouble(2)).sum / rows.length)
    }
    val (xBefore, yBefore) = meanSpans()
    val (nBefore, _, nAfter) = Compaction.recluster(spark, dir,
      "x", (0.0, 1000.0), "y", (0.0, 1000.0), targetBytes = 8L * 1024)
    val (xAfter, yAfter) = meanSpans()
    assert(nBefore === 8 && nAfter > 1, s"files $nBefore -> $nAfter")
    // both columns' per-file envelopes must shrink materially
    assert(xAfter < xBefore * 0.8, s"x span $xBefore -> $xAfter")
    assert(yAfter < yBefore * 0.8, s"y span $yBefore -> $yAfter")
    // and no rows were lost in the rewrite
    assert(spark.read.parquet(dir).count() === 8000L)
  }

  private def bytesOf(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }
}
