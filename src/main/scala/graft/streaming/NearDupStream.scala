package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.CacheScope
import graft.similarity.HyperplaneLSH

/** Continuous embedding near-duplicate detection — the streaming form of
  * [[HyperplaneLSH.nearDupPairsIncremental]]: every micro-batch joins
  * the STORED bucket table, emits the pairs it completes, and appends
  * its own buckets, so each arriving vector is checked against
  * everything that ever arrived at per-batch cost proportional to the
  * batch.
  *
  * `foreachBatch` is the right seam, not stream-native state: a
  * `mapGroupsWithState` formulation would pin the whole corpus
  * signature set in executor state stores, while a parquet bucket table
  * scales with storage, survives restarts, and is directly usable by
  * the batch operators (one artifact for both worlds).
  *
  * Restart safety: both outputs are partitioned by `__batch_id` and
  * written with dynamic partition overwrite, and the stored-bucket read
  * filters to `__batch_id < current` — a replayed batch overwrites its
  * own partitions and recomputes against exactly the pre-batch corpus,
  * so the sink is idempotent (exactly-once results over at-least-once
  * execution, the standard foreachBatch contract). */
object NearDupStream {

  /** One micro-batch: pairs completed by `batch` written to
    * `pairsPath/__batch_id=N`, the batch's buckets appended to
    * `bucketsPath/__batch_id=N`. Public so batch jobs (backfills,
    * tests) can drive the exact sink logic. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, nBits: Int, seed: Long, threshold: Double,
      bucketsPath: String, pairsPath: String, dims: Int = 64): Unit = {
    val spark = batch.sparkSession
    val target = new HPath(bucketsPath)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val hasCorpus = fs.exists(target) && fs.listStatus(target).nonEmpty
    CacheScope.withScope { scope =>
      val pairs =
        if (hasCorpus)
          HyperplaneLSH.nearDupPairsIncremental(batch,
            spark.read.parquet(bucketsPath)
              .filter(col("__batch_id") < batchId),
            idCol, vecCol, nBits, seed, threshold, dims, scope)
        else // first batch: only within-batch pairs exist
          HyperplaneLSH.nearDupPairs(batch, idCol, vecCol, nBits, seed,
            threshold, dims, scope)
      pairs.withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id").parquet(pairsPath)
      HyperplaneLSH.bucketTable(batch, idCol, vecCol, nBits, seed, dims)
        .withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id").parquet(bucketsPath)
    }
  }

  /** Attach the sink to a streaming vector source and start it. */
  def start(vecs: DataFrame, idCol: String, vecCol: String, nBits: Int,
      seed: Long, threshold: Double, bucketsPath: String,
      pairsPath: String, checkpointDir: String, dims: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        processBatch(b, id, idCol, vecCol, nBits, seed, threshold,
          bucketsPath, pairsPath, dims))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
