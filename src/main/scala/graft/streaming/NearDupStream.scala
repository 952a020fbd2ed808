package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType

import graft.core.CacheScope
import graft.similarity.HyperplaneLSH

/** Continuous embedding near-duplicate detection — the streaming form of
  * [[HyperplaneLSH.nearDupPairsIncremental]]: every micro-batch joins
  * the STORED bucket table, emits the pairs it completes, and appends
  * its own buckets. Only the increment is re-projected against the
  * hyperplanes; the corpus is touched through the bucket join alone
  * (one scan of the stored signature table per batch — signatures, not
  * raw vectors re-hashed).
  *
  * `foreachBatch` is the right seam, not stream-native state: a
  * `mapGroupsWithState` formulation would pin the whole corpus
  * signature set in executor state stores, while a parquet bucket table
  * scales with storage, survives restarts, and is directly usable by
  * the batch operators (one artifact for both worlds).
  *
  * Restart safety, all three failure classes handled loudly or
  * idempotently:
  *  - replayed batch (normal at-least-once foreachBatch): both outputs
  *    partition by `__batch_id` with dynamic overwrite, and the stored
  *    read filters to `__batch_id < current`, so a replay overwrites
  *    its own partitions and recomputes against exactly the pre-batch
  *    corpus — a no-op (spec-pinned);
  *  - torn first write / empty directory: the stored table is read with
  *    an explicit schema, so a directory holding only `_SUCCESS` or
  *    `_temporary` reads as an empty corpus instead of crash-looping on
  *    schema inference;
  *  - lost checkpoint: batch ids would restart at 0, silently hiding
  *    the corpus and clobbering partition 0 — processBatch refuses
  *    (loud error) when `batchId` is behind the newest stored
  *    partition, and a `_LSH_PARAMS` marker pins the (nBits, seed,
  *    dims) plane family so a restart with different parameters cannot
  *    silently join incompatible signatures. */
object NearDupStream {

  private def writePartitioned(
      df: DataFrame, path: String, batchId: Long): Unit =
    df.withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(path)

  private def paramsTag(nBits: Int, seed: Long, dims: Int): String =
    s"""{"nBits":$nBits,"seed":$seed,"dims":$dims}"""

  /** Write-once plane-family marker; refuses a mismatch on re-entry. */
  private def checkParams(fs: FileSystem, bucketsPath: String,
      tag: String): Unit = {
    val marker = new HPath(new HPath(bucketsPath), "_LSH_PARAMS")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val stored =
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      require(stored == tag,
        s"bucket table at $bucketsPath was built with plane family " +
          s"$stored; refusing to join with $tag — joining tables from " +
          "different plane families finds nothing")
    } else {
      val out = fs.create(marker, false)
      try out.write(tag.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Newest stored batch partition, from directory names only (no data
    * read). */
  private def maxStoredBatch(fs: FileSystem, path: HPath): Option[Long] =
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("__batch_id="))
      .map(_.stripPrefix("__batch_id=").toLong)
      .maxOption

  /** One micro-batch: pairs completed by `batch` written to
    * `pairsPath/__batch_id=N`, the batch's buckets (derived ONCE, also
    * feeding the pair join) appended to `bucketsPath/__batch_id=N`.
    * Public so batch jobs (backfills, tests) can drive the exact sink
    * logic. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, nBits: Int, seed: Long, threshold: Double,
      bucketsPath: String, pairsPath: String, dims: Int = 64): Unit = {
    val spark = batch.sparkSession
    val target = new HPath(bucketsPath)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    maxStoredBatch(fs, target).foreach(m => require(batchId >= m,
      s"batch $batchId is behind the stored bucket table (newest " +
        s"partition $m) at $bucketsPath — a lost or foreign checkpoint " +
        "would silently hide the corpus and clobber old partitions; " +
        "refusing"))
    checkParams(fs, bucketsPath, paramsTag(nBits, seed, dims))
    CacheScope.withScope { scope =>
      // derived once: feeds the pair join AND the bucket write
      val bucketsNow = scope.retain(
        HyperplaneLSH.bucketTable(batch, idCol, vecCol, nBits, seed, dims))
      // explicit schema: an empty or torn directory is an empty corpus,
      // never a schema-inference crash loop
      val stored = spark.read
        .schema(bucketsNow.schema.add("__batch_id", LongType))
        .parquet(bucketsPath)
      val pairs = HyperplaneLSH.nearDupPairsIncrementalBucketed(
        bucketsNow,
        stored.filter(col("__batch_id") < batchId).drop("__batch_id"),
        idCol, vecCol, threshold)
      writePartitioned(pairs, pairsPath, batchId)
      writePartitioned(bucketsNow, bucketsPath, batchId)
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
