package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data delivery: deterministic sharded JSONL export plus a
  * content manifest — the last mile of a curation pipeline, where a
  * training loader needs (a) a fixed number of shard files, (b) a
  * reproducible row-to-shard assignment and in-shard order (so a resumed
  * or re-run export is byte-compatible), and (c) per-shard row counts
  * and checksums to validate delivery without re-reading the corpus.
  *
  * Shard assignment is Spark's deterministic hash partitioning on the
  * order column (fixed seed — NOT repartitionByRange, whose sampled
  * boundaries depend on the RDD id and change across sessions), and rows
  * are sorted within each shard; both choices make re-exports of the
  * same input bit-identical.
  */
object TrainingExport {

  /** Write `df` as `shards` JSONL part files under `path`, deterministic
    * assignment + in-shard ordering by `orderCol`. */
  def exportJsonl(df: DataFrame, path: String, shards: Int,
      orderCol: String, compress: Boolean = false): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val w = df.repartition(shards, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** Per-shard manifest of an exported directory: file name, row count,
    * and an order-independent content checksum (sum of per-line
    * xxhash64, wrapping) — one small aggregation over the export, no
    * driver-side row handling. */
  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.format("text").load(path)
      .select(input_file_name().as("file"), col("value"))
      .select(element_at(split(col("file"), "/"), -1).as("shard"),
        xxhash64(col("value")).as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))

  /** Write the manifest INTO the export directory as `_MANIFEST.json`
    * (underscore-prefixed, so Spark readers skip it). Driver-side write
    * of a #shards-row summary — bounded by file count, never data. */
  def writeManifest(spark: SparkSession, path: String): Unit = {
    val rows = manifest(spark, path).orderBy(col("shard")).collect()
    val json = rows.map { r =>
      s"""{"shard":"${r.getString(0)}","n_rows":${r.getLong(1)},""" +
        s""""checksum":${r.getLong(2)}}"""
    }.mkString("[\n", ",\n", "\n]")
    Files.write(Paths.get(path, "_MANIFEST.json"),
      json.getBytes(StandardCharsets.UTF_8))
  }
}
