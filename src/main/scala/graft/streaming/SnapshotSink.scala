package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.core.Snapshots

/** Streaming sink that lands every micro-batch as ONE committed
  * [[Snapshots]] version — exactly once across restarts.
  *
  * Structured Streaming's foreachBatch contract is at-least-once: after
  * a crash, the last uncommitted-to-the-checkpoint batch is REPLAYED
  * with the same batchId. The sink therefore commits through
  * [[Snapshots.commitTagged]] with the batchId as the idempotency tag:
  * the tag file lands inside the version's data directory BEFORE the
  * commit-marker claim, so every crash window resolves correctly —
  * before the marker, the half-written version is invisible (vacuumable
  * debris) and the replay commits cleanly; after the marker, the tag is
  * visible and the replay is skipped. No ledger to keep in sync, no
  * two-phase bookkeeping: the snapshot protocol's own atomic claim does
  * the work.
  *
  * What this buys at scale: a streaming pipeline whose output table has
  * time travel — every micro-batch is a queryable, rollback-able
  * version, and a bad deploy is undone with `Snapshots.rollback`
  * instead of a backfill.
  */
object SnapshotSink {

  /** One micro-batch: commit as a tagged version (None when the batch
    * id was already committed — the replay case). Public so tests and
    * batch backfills drive the exact sink logic. */
  def processBatch(batch: DataFrame, batchId: Long,
      tableDir: String): Option[Long] =
    Snapshots.commitTagged(batch, tableDir, s"batch-$batchId")

  /** foreachBatch writer landing each micro-batch as a version. Caller
    * sets the checkpoint location and trigger, then `.start()`. */
  def append(stream: DataFrame, tableDir: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, id: Long) => processBatch(batch, id, tableDir); ()
    }

  /** [[processBatch]] committing the version WITH its per-file Bloom
    * index ([[graft.core.BloomIndex.commitIndexedTagged]]): the ingest
    * half of the versioned-table pipeline — every micro-batch becomes a
    * time-travelable version that supports index-pruned point lookups
    * the moment it commits. */
  def processBatchIndexed(batch: DataFrame, batchId: Long, tableDir: String,
      keyCol: String, expectedItemsPerFile: Long): Option[Long] =
    graft.core.BloomIndex.commitIndexedTagged(batch, tableDir,
      s"batch-$batchId", keyCol, expectedItemsPerFile)

  /** [[append]] with per-version Bloom indexes. Exactly-once under
    * replays like [[append]]; see [[graft.core.Compaction.squashVersions]]
    * for the maintenance half (squash + recluster + reindex), and note
    * its retention caveat for replay horizons. */
  def appendIndexed(stream: DataFrame, tableDir: String, keyCol: String,
      expectedItemsPerFile: Long): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, id: Long) =>
        processBatchIndexed(batch, id, tableDir, keyCol,
          expectedItemsPerFile); ()
    }

  /** One CDC micro-batch as a merge-on-read UPSERT version
    * ([[graft.core.Deletes.commitUpsertTagged]]): the batch's rows land,
    * and matching keys in every earlier version are superseded at read
    * time — no rewrite of history, exactly-once under replays. Read the
    * table with [[graft.core.Deletes.readMerged]];
    * [[graft.core.Deletes.materialize]] /
    * [[graft.core.Compaction.squashVersions]] fold the deletes in during
    * maintenance. */
  def processBatchUpsert(batch: DataFrame, batchId: Long, tableDir: String,
      keyCols: Seq[String]): Option[Long] =
    graft.core.Deletes.commitUpsertTagged(batch.sparkSession, tableDir,
      batch, keyCols, s"batch-$batchId")

  /** foreachBatch writer applying each micro-batch as a keyed upsert —
    * the streaming CDC apply path over a versioned table. */
  def upsert(stream: DataFrame, tableDir: String,
      keyCols: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, id: Long) =>
        processBatchUpsert(batch, id, tableDir, keyCols); ()
    }
}
