package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}

import graft.SparkSpec

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-snap").toString

  private def vals(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.as[Long].collect().toSet

  test("commit/read round-trips versions; latest wins; time travel works") {
    val dir = tmp()
    assert(Snapshots.commit(Seq(1L, 2L).toDF("x"), dir) === 1L)
    assert(Snapshots.commit(Seq(3L).toDF("x"), dir) === 2L)
    assert(Snapshots.commit(Seq(4L, 5L).toDF("x"), dir) === 3L)
    assert(Snapshots.versions(spark, dir) === Seq(1L, 2L, 3L))
    assert(vals(Snapshots.read(spark, dir)) === Set(4L, 5L))
    assert(vals(Snapshots.read(spark, dir, Some(1L))) === Set(1L, 2L))
    assert(vals(Snapshots.read(spark, dir, Some(2L))) === Set(3L))
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, dir, Some(9L))
    }
  }

  test("rollback truncates history and is reversible until prune") {
    val dir = tmp()
    (1 to 3).foreach(i => Snapshots.commit(Seq(i.toLong).toDF("x"), dir))
    Snapshots.rollback(spark, dir, toVersion = 1L)
    assert(Snapshots.versions(spark, dir) === Seq(1L))
    assert(vals(Snapshots.read(spark, dir)) === Set(1L))
    // a new commit after rollback claims the next free number, not v2:
    // the rolled-back data dirs still exist, so their versions are burned
    val v = Snapshots.commit(Seq(9L).toDF("x"), dir)
    assert(v > 1L && vals(Snapshots.read(spark, dir)) === Set(9L))
  }

  test("prune keeps the newest K versions and deletes old data") {
    val dir = tmp()
    (1 to 4).foreach(i => Snapshots.commit(Seq(i.toLong).toDF("x"), dir))
    Snapshots.prune(spark, dir, keep = 2)
    assert(Snapshots.versions(spark, dir) === Seq(3L, 4L))
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, dir, Some(1L))
    }
    assert(vals(Snapshots.read(spark, dir)) === Set(4L))
  }

  test("unmarked (crashed) data dirs are invisible and vacuumed") {
    val dir = tmp()
    Snapshots.commit(Seq(1L).toDF("x"), dir)
    // simulate a crash: data written but no marker
    Seq(7L).toDF("x").write.parquet(s"$dir/v=99")
    assert(Snapshots.versions(spark, dir) === Seq(1L))
    assert(vals(Snapshots.read(spark, dir)) === Set(1L))
    assert(Snapshots.vacuum(spark, dir) === Seq(99L))
    val fs = new HPath(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(!fs.exists(new HPath(dir, "v=99")))
  }

  test("a racing writer that claims the version first forces a retry upward") {
    val dir = tmp()
    Snapshots.commit(Seq(1L).toDF("x"), dir)
    // adversary pre-claims version 2 with an empty (but committed) dir
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    Seq(2L).toDF("x").write.parquet(s"$dir/v=2")
    fs.create(new HPath(dir, "_commits/2"), false).close()
    val v = Snapshots.commit(Seq(3L).toDF("x"), dir)
    assert(v === 3L)
    assert(vals(Snapshots.read(spark, dir, Some(2L))) === Set(2L))
    assert(vals(Snapshots.read(spark, dir, Some(3L))) === Set(3L))
  }
}
