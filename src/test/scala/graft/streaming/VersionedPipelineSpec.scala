package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{BloomIndex, Compaction, Snapshots}

/** The versioned-table pipeline END TO END: streaming ingest
  * (SnapshotSink.appendIndexed — one Bloom-indexed version per
  * micro-batch, exactly-once under replays) → maintenance
  * (Compaction.squashVersions — union, z-order recluster, reindex,
  * prune) → index-pruned point lookups that stay EXACT across the whole
  * chain. The three pieces pass their own specs; this is the
  * integration run that exercises them together, including the
  * kill/restart windows at each seam.
  */
class VersionedPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq(3L, 7L, 1000001L) // present, present, absent

  test("ingest -> indexed versions -> squash+recluster -> lookups stay exact") {
    val dir = Files.createTempDirectory("graft-vpipe").toString
    val table = s"$dir/table"
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events",
        parallelize = false)
      .select(col("event_id"), col("user_id"),
        col("value").cast("double").as("value"))
    val expected = ev.as[(Long, Long, Double)].collect().toSet

    // --- ingest: three micro-batches, each an indexed version;
    // batch 1 replays once mid-stream (the at-least-once window)
    val batches = (0 to 2).map(i => ev.filter(col("event_id") % 3 === i))
    assert(SnapshotSink.processBatchIndexed(
      batches(0), 0L, table, "event_id", 5000L).isDefined)
    assert(SnapshotSink.processBatchIndexed(
      batches(1), 1L, table, "event_id", 5000L).isDefined)
    assert(SnapshotSink.processBatchIndexed(
      batches(1), 1L, table, "event_id", 5000L).isEmpty, "replay must skip")
    assert(SnapshotSink.processBatchIndexed(
      batches(2), 2L, table, "event_id", 5000L).isDefined)
    val vs = Snapshots.versions(spark, table)
    assert(vs.size === 3)

    // per-version indexed lookup == that version's full scan
    val latest = vs.max
    val viaIdx = BloomIndex.lookupVersion(spark, table, "event_id", keys)
      .select("event_id").as[Long].collect().toSet
    val viaScan = Snapshots.read(spark, table, Some(latest))
      .filter(col("event_id").isin(keys: _*))
      .select("event_id").as[Long].collect().toSet
    assert(viaIdx === viaScan)

    // --- maintenance: squash + recluster + reindex + prune
    val squashV = Compaction.squashVersions(spark, table,
      keyCol = "event_id", expectedItemsPerFile = 20000L,
      colA = "user_id", colB = "value",
      targetBytes = 64L * 1024).get
    assert(Snapshots.versions(spark, table) === Seq(squashV))

    // the squashed table holds exactly the ingested union
    val after = Snapshots.read(spark, table)
      .as[(Long, Long, Double)].collect().toSet
    assert(after === expected)

    // indexed point lookup through the squash version == exact filter
    val hit = BloomIndex.lookupVersion(spark, table, "event_id", keys)
      .select("event_id").as[Long].collect().toSet
    assert(hit === expected.map(_._1).filter(keys.contains).toSet)
    assert(hit === Set(3L, 7L))

    // --- kill/restart at the maintenance seam: a re-fired squash with
    // no new batches is a no-op; a replay of ANY squashed batch id is
    // still skipped (tags were carried into the squash version)
    assert(Compaction.squashVersions(spark, table, "event_id", 20000L,
      "user_id", "value").isEmpty)
    (0 to 2).foreach { i =>
      assert(SnapshotSink.processBatchIndexed(
        batches(i), i.toLong, table, "event_id", 5000L).isEmpty,
        s"replay of squashed batch $i must skip")
    }
    assert(Snapshots.versions(spark, table) === Seq(squashV))

    // --- pipeline continues: a NEW batch after the squash commits and
    // a second squash folds it in (tagged by the new latest version)
    val extra = Seq((2000001L, 42L, 1.5)).toDF("event_id", "user_id", "value")
    assert(SnapshotSink.processBatchIndexed(
      extra, 3L, table, "event_id", 5000L).isDefined)
    val squash2 = Compaction.squashVersions(spark, table, "event_id", 20000L,
      "user_id", "value", targetBytes = 64L * 1024).get
    assert(squash2 > squashV)
    assert(Snapshots.versions(spark, table) === Seq(squash2))
    assert(Snapshots.read(spark, table).count() === expected.size + 1L)
    assert(BloomIndex.lookupVersion(spark, table, "event_id", Seq(2000001L))
      .count() === 1L)
    // batch tags carried through BOTH squashes: replaying batch 0 after
    // two generations of maintenance still skips
    assert(SnapshotSink.processBatchIndexed(
      batches(0), 0L, table, "event_id", 5000L).isEmpty)
  }

  test("squash restores clustering: per-file envelopes shrink on both axes") {
    val dir = Files.createTempDirectory("graft-vpipe2").toString
    val table = s"$dir/table"
    // interleaved appends destroy locality: each batch spans the FULL
    // key range of both columns
    val base = (0L until 8000L).map(i => (i, i % 97, (i % 89).toDouble))
      .toDF("event_id", "user_id", "value")
    (0 to 3).foreach { b =>
      assert(SnapshotSink.processBatchIndexed(
        base.filter(col("event_id") % 4 === b).repartition(4),
        b.toLong, table, "event_id", 3000L).isDefined)
    }
    def spanSum(): (Double, Double) = {
      val vs = Snapshots.versions(spark, table)
      val per = vs.map { v =>
        spark.read.parquet(s"$table/v=$v")
          .groupBy(input_file_name())
          .agg((max("user_id") - min("user_id")).cast("double").as("su"),
            (max("value") - min("value")).as("sv"))
          .agg(avg("su"), avg("sv")).head()
      }
      (per.map(_.getDouble(0)).sum / per.size,
        per.map(_.getDouble(1)).sum / per.size)
    }
    val (u0, v0) = spanSum()
    Compaction.squashVersions(spark, table, "event_id", 10000L,
      "user_id", "value", targetBytes = 24L * 1024)
    val (u1, v1) = spanSum()
    assert(u1 < u0 * 0.8 && v1 < v0 * 0.8,
      s"expected both envelopes to shrink >20%: user $u0->$u1, value $v0->$v1")
  }
}
