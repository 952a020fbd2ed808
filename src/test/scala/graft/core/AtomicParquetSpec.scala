package graft.core

import java.nio.file.Files

import graft.SparkSpec

class AtomicParquetSpec extends SparkSpec {
  import spark.implicits._

  test("overwrite swaps generations; old data readable until the swap") {
    val dir = Files.createTempDirectory("graft-atomic").toString + "/dest"
    AtomicParquet.overwrite(Seq(1, 2, 3).toDF("x"), dir)
    assert(AtomicParquet.read(spark, dir).count() == 3)
    AtomicParquet.overwrite(Seq(4, 5).toDF("x"), dir)
    assert(AtomicParquet.read(spark, dir).as[Int].collect().toSet == Set(4, 5))
    // no staging/backup residue
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".__staging__")))
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".__old__")))
  }

  test("failed staging write leaves the previous generation intact") {
    val dir = Files.createTempDirectory("graft-atomic2").toString + "/dest"
    AtomicParquet.overwrite(Seq(1, 2).toDF("x"), dir)
    val bad = Seq("boom").toDF("x")
      .selectExpr("CAST(x AS INT) AS x", "raise_error('fail') AS y")
    intercept[Throwable] { AtomicParquet.overwrite(bad, dir) }
    assert(AtomicParquet.read(spark, dir).count() == 2)
  }
}
