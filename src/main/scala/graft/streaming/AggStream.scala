package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType

import graft.operators.IncrementalAgg

/** Continuously-maintained aggregate state — the streaming form of
  * [[IncrementalAgg]] (an incremental materialized view fed by
  * micro-batches). Each batch folds to its per-key partial state and
  * appends it as its own `__batch_id` partition; the current view merges
  * the partitions at read time. Mirrors [[NearDupStream]]'s storage
  * discipline:
  *
  *  - replayed batch (at-least-once foreachBatch): the partition write
  *    uses dynamic overwrite, so a replay overwrites ITS OWN partition
  *    — idempotent (spec-pinned across a kill/restart);
  *  - torn first write: reads use an explicit schema, so an empty or
  *    `_SUCCESS`-only directory is an empty state, not a
  *    schema-inference crash;
  *  - lost checkpoint: a batch id behind the newest stored partition
  *    refuses loudly instead of silently clobbering history.
  *
  * Why merge-on-read instead of read-modify-write state: the per-batch
  * write touches only |keys in batch| rows and needs no read of the
  * accumulated state (no write amplification, trivially idempotent);
  * the read-side merge is one |keys|-sized aggregation. [[compact]]
  * folds accumulated partitions into one when batch count grows —
  * after which the directory holds a single partition carrying the
  * newest batch id, so ingestion continues seamlessly.
  */
object AggStream {

  private def maxStoredBatch(fs: FileSystem, path: HPath): Option[Long] =
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("__batch_id="))
      .flatMap(_.stripPrefix("__batch_id=").toLongOption)
      .maxOption

  /** One micro-batch: fold `batch` and write its state partition.
    * Public so batch backfills and tests drive the exact sink logic. */
  def processBatch(batch: DataFrame, batchId: Long, keys: Seq[String],
      valueCol: String, statePath: String): Unit = {
    val spark = batch.sparkSession
    val target = new HPath(statePath)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    maxStoredBatch(fs, target).foreach { m =>
      require(batchId >= m,
        s"batch $batchId is behind the stored state (newest partition $m) " +
          s"at $statePath — a lost or foreign checkpoint would silently " +
          "clobber accumulated state; refusing")
    }
    IncrementalAgg.state(batch, keys, valueCol)
      .withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(statePath)
  }

  /** The state table's schema for explicit-schema reads (torn-write
    * safety). Derived from an empty fold so it always matches what
    * [[processBatch]] writes. */
  private def stateSchema(spark: SparkSession, template: DataFrame,
      keys: Seq[String], valueCol: String) =
    IncrementalAgg.state(template.limit(0), keys, valueCol)
      .schema.add("__batch_id", LongType)

  /** Current finalized view of the accumulated state: one merged row
    * per key. `template` supplies the key/value column types (usually
    * the source DataFrame). */
  def current(spark: SparkSession, template: DataFrame, keys: Seq[String],
      valueCol: String, statePath: String): DataFrame = {
    val stored = spark.read
      .schema(stateSchema(spark, template, keys, valueCol))
      .parquet(statePath)
      .drop("__batch_id")
    IncrementalAgg.finalize(IncrementalAgg.merge(Seq(stored), keys), keys)
  }

  /** Fold all partitions into one carrying the newest batch id (write
    * amplification bounded: run when partition count grows, not per
    * batch). Crash-atomic via the [[graft.core.AtomicParquet]]
    * staged-rename swap — sum/count partials are NOT idempotent under
    * re-merging, so the old overwrite-newest-then-delete-stale sequence
    * had a crash window (merged partition written, stale partitions not
    * yet deleted) after which merge-on-read double-counted every prior
    * batch. Single-writer: must not run concurrently with an active
    * [[start]] sink on the same path. */
  def compact(spark: SparkSession, template: DataFrame, keys: Seq[String],
      valueCol: String, statePath: String): Unit = {
    val target = new HPath(statePath)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    maxStoredBatch(fs, target).foreach { newest =>
      val stored = spark.read
        .schema(stateSchema(spark, template, keys, valueCol))
        .parquet(statePath)
      val merged = IncrementalAgg.merge(Seq(stored.drop("__batch_id")), keys)
        .withColumn("__batch_id", lit(newest))
      graft.core.AtomicParquet.overwrite(
        merged, statePath, partitionCols = Seq("__batch_id"))
    }
  }

  /** Attach the sink to a streaming source and start it. */
  def start(rows: DataFrame, keys: Seq[String], valueCol: String,
      statePath: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rows.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        processBatch(b, id, keys, valueCol, statePath))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
