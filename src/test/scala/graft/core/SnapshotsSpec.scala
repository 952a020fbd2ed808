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
    assert(Snapshots.vacuum(spark, dir, graceMs = 0L) === Seq(99L))
    val fs = new HPath(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(!fs.exists(new HPath(dir, "v=99")))
  }

  test("vacuum grace window protects in-flight commits from a racing vacuum") {
    val dir = tmp()
    Snapshots.commit(Seq(1L).toDF("x"), dir)
    // in-flight writer state: a staged attempt (pre-claim) and a fresh
    // unmarked data dir (the old protocol's pre-marker window)
    Seq(7L).toDF("x").write.parquet(s"$dir/_staging/in-flight")
    Seq(8L).toDF("x").write.parquet(s"$dir/v=50")
    // default grace: everything is seconds old -> nothing reclaimed
    assert(Snapshots.vacuum(spark, dir) === Seq.empty)
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new HPath(dir, "_staging/in-flight")))
    assert(fs.exists(new HPath(dir, "v=50")))
    // past the grace window the same debris is reclaimed
    assert(Snapshots.vacuum(spark, dir, graceMs = 0L) === Seq(50L))
    assert(!fs.exists(new HPath(dir, "_staging/in-flight")))
    assert(!fs.exists(new HPath(dir, "v=50")))
  }

  test("a dead marker (claim landed, publish crashed) never resolves") {
    val dir = tmp()
    Snapshots.commit(Seq(1L).toDF("x"), dir)
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // claim for v=2 landed but the writer died before renaming its
    // staging dir into place: marker with no data
    fs.create(new HPath(dir, "_commits/2"), false).close()
    assert(Snapshots.versions(spark, dir) === Seq(1L))
    assert(vals(Snapshots.read(spark, dir)) === Set(1L))
    // the number is burned: the next commit claims above the dead marker
    assert(Snapshots.commit(Seq(9L).toDF("x"), dir) === 3L)
    assert(Snapshots.versions(spark, dir) === Seq(1L, 3L))
    // vacuum clears the dead marker once past the grace window
    Snapshots.vacuum(spark, dir, graceMs = 0L)
    assert(!fs.exists(new HPath(dir, "_commits/2")))
    assert(Snapshots.versions(spark, dir) === Seq(1L, 3L))
  }

  test("concurrent writers: every commit survives with its own data") {
    // the round-9 race: two writers that both resolved latest=N-1 could
    // delete each other's v=N data. The staged-unique-dir protocol makes
    // that structurally impossible — prove it with real racing threads.
    val dir = tmp()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = Snapshots.commit(Seq(i.toLong).toDF("x"), dir)
        })
      }
      val versions = futures.map(_.get()).sorted
      assert(versions.distinct.size === 8, s"duplicate claims: $versions")
      assert(Snapshots.versions(spark, dir) === versions)
      // every writer's payload is intact under the version it reported
      val payloads = versions.map(v =>
        vals(Snapshots.read(spark, dir, Some(v)))).toSet
      assert(payloads === (1 to 8).map(i => Set(i.toLong)).toSet)
      // no staging debris left behind by successful commits
      val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
      val staged = Option(fs.globStatus(new HPath(dir, "_staging/*")))
        .getOrElse(Array.empty)
      assert(staged.isEmpty, s"leftover staging: ${staged.mkString(",")}")
    } finally pool.shutdown()
  }

  test("vacuum never reclaims rolled-back undo data; unrollback restores it") {
    val dir = tmp()
    (1 to 3).foreach(i => Snapshots.commit(Seq(i.toLong).toDF("x"), dir))
    Snapshots.rollback(spark, dir, toVersion = 1L)
    // rolled-back dirs are tombstoned, so even a zero-grace vacuum —
    // which reclaims genuine debris — leaves them alone
    assert(Snapshots.vacuum(spark, dir, graceMs = 0L) === Seq.empty)
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new HPath(dir, "v=2")))
    assert(fs.exists(new HPath(dir, "v=3")))
    // ...and the rollback is still undoable afterwards
    assert(Snapshots.unrollback(spark, dir) === Seq(2L, 3L))
    assert(Snapshots.versions(spark, dir) === Seq(1L, 2L, 3L))
    assert(vals(Snapshots.read(spark, dir)) === Set(3L))
    // tombstones cleared: a second unrollback is a no-op
    assert(Snapshots.unrollback(spark, dir) === Seq.empty)
  }

  test("prune reclaims only rolled-back dirs older than the kept window") {
    val dir = tmp()
    (1 to 2).foreach(i => Snapshots.commit(Seq(i.toLong).toDF("x"), dir))
    Snapshots.rollback(spark, dir, toVersion = 1L) // tombstones v=2
    Snapshots.commit(Seq(3L).toDF("x"), dir)       // claims v=3
    Snapshots.commit(Seq(4L).toDF("x"), dir)       // claims v=4
    assert(Snapshots.versions(spark, dir) === Seq(1L, 3L, 4L))
    Snapshots.prune(spark, dir, keep = 2)          // keeps {3, 4}
    assert(Snapshots.versions(spark, dir) === Seq(3L, 4L))
    // v=2 (rolled back, older than oldest kept) aged out with the prune
    val fs = new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new HPath(dir, "v=2")))
    assert(Snapshots.unrollback(spark, dir) === Seq.empty)
    // a rollback INSIDE the kept window survives the next prune
    Snapshots.rollback(spark, dir, toVersion = 3L) // tombstones v=4
    Snapshots.prune(spark, dir, keep = 1)          // keeps {3}; 4 > 3
    assert(fs.exists(new HPath(dir, "v=4")))
    assert(Snapshots.unrollback(spark, dir) === Seq(4L))
    assert(vals(Snapshots.read(spark, dir)) === Set(4L))
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
