package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  // 8 files of 1000 disjoint keys each (a key lives in exactly one file)
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-bloomidx").toString
    (0L until 8000L).map(i => (i, s"payload-$i"))
      .toDF("k", "v")
      .withColumn("shard", (col("k") / 1000).cast("int"))
      .repartition(8, col("shard"))
      .drop("shard")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("index has one row per file and the lookup equals the full scan") {
    val idx = BloomIndex.build(spark, dir, "k",
      expectedItemsPerFile = 2000L).cache()
    val nFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(idx.count() === nFiles)
    assert(idx.agg(sum("n_rows")).as[Long].head() === 8000L)

    for (keys <- Seq(Seq(42L), Seq(42L, 7777L), Seq(123456L))) {
      val viaIndex = BloomIndex.lookup(spark, idx, "k", keys)
        .select("k", "v").as[(Long, String)].collect().toSet
      val fullScan = spark.read.parquet(dir)
        .filter(col("k").isin(keys: _*))
        .select("k", "v").as[(Long, String)].collect().toSet
      assert(viaIndex === fullScan, s"keys=$keys")
    }
  }

  test("the index actually prunes: a point key touches few files") {
    val idx = BloomIndex.build(spark, dir, "k",
      expectedItemsPerFile = 2000L, fpp = 0.01)
    val candidates = BloomIndex.candidateFiles(idx, Seq(42L))
    // the key lives in exactly 1 of 8 files; 1% fpp leaves little room
    // for extras — anything under half the files proves real pruning
    assert(candidates.nonEmpty && candidates.size <= 3,
      s"expected strong pruning, got ${candidates.size} of 8 files")
  }

  test("absent keys: empty result, schema preserved") {
    val idx = BloomIndex.build(spark, dir, "k", 2000L)
    val out = BloomIndex.lookup(spark, idx, "k", Seq(999999L))
    assert(out.columns.toSeq === Seq("k", "v"))
    assert(out.count() === 0L)
  }
}
