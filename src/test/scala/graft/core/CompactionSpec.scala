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

  private def bytesOf(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }
}
