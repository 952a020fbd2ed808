package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.Snapshots

class SnapshotSinkSpec extends SparkSpec {
  import spark.implicits._

  test("3-batch kill/restart ingest: one version per batch, union equals input") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events",
      parallelize = false).select("event_id", "event_type")
    val dir = Files.createTempDirectory("graft_snap_sink").toString
    val (in, table, ckpt) = (s"$dir/in", s"$dir/table", s"$dir/ckpt")
    val thirds = (0 to 2).map(i => ev.filter(col("event_id") % 3 === i))
    thirds.foreach { third =>
      third.coalesce(1).write.mode("append").parquet(in)
      val src = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = SnapshotSink.append(src, table)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val versions = Snapshots.versions(spark, table)
    assert(versions.size === 3, s"one version per micro-batch: $versions")
    val union = versions
      .map(v => Snapshots.read(spark, table, Some(v)))
      .reduce(_ union _).as[(Long, String)].collect().toSet
    assert(union === ev.as[(Long, String)].collect().toSet)
  }

  test("a replayed batch id commits nothing (exactly-once)") {
    val dir = Files.createTempDirectory("graft_snap_once").toString
    val table = s"$dir/table"
    val b = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(SnapshotSink.processBatch(b, 7L, table).contains(1L))
    // the at-least-once replay: same batch id arrives again
    assert(SnapshotSink.processBatch(b, 7L, table).isEmpty)
    assert(Snapshots.versions(spark, table) === Seq(1L))
    // a NEW batch id commits normally
    assert(SnapshotSink.processBatch(b, 8L, table).contains(2L))
    assert(Snapshots.versions(spark, table) === Seq(1L, 2L))
  }

  test("a crashed (unmarked) tagged attempt is invisible and retried cleanly") {
    val dir = Files.createTempDirectory("graft_snap_crash").toString
    val table = s"$dir/table"
    val b = Seq((1L, "a")).toDF("k", "v")
    // simulate the pre-marker crash: data dir + tag, NO commit marker
    b.write.parquet(s"$table/v=1")
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(table, "_commits"))
    fs.create(new org.apache.hadoop.fs.Path(table, "v=1/_tag-batch-0"),
      true).close()
    // the tag is on an UNCOMMITTED version, so the replay must commit.
    // The crashed attempt's number is BURNED (nextVersion counts data
    // dirs too, so rolled-back/debris numbers are never reused): the
    // clean retry lands at v=2, and the debris stays invisible.
    assert(Snapshots.taggedVersion(spark, table, "batch-0").isEmpty)
    assert(SnapshotSink.processBatch(b, 0L, table).contains(2L))
    assert(Snapshots.versions(spark, table) === Seq(2L))
    assert(Snapshots.read(spark, table).count() === 1L)
  }
}
