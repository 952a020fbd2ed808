package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data delivery: deterministic sharded JSONL export plus a
  * content manifest — the last mile of a curation pipeline, where a
  * training loader needs (a) a stable set of shard files, (b) a
  * reproducible row-to-shard assignment and in-shard order (so a resumed
  * or re-run export is byte-compatible), and (c) per-shard row counts
  * and checksums to validate delivery without re-reading the corpus.
  *
  * Shard assignment is Spark's deterministic hash partitioning on the
  * order column (fixed seed — NOT repartitionByRange, whose sampled
  * boundaries depend on the RDD id and change across sessions), and rows
  * are sorted within each shard with the remaining columns as
  * tiebreakers, so re-exports of the same input are bit-identical even
  * when `orderCol` carries duplicates. Loaders should enumerate shard
  * files from the manifest, not assume exactly `shards` files: a
  * low-cardinality `orderCol` (fewer distinct values than shards) leaves
  * some hash partitions empty and they emit no part file.
  */
object TrainingExport {

  /** Write `df` as up to `shards` JSONL part files under `path`,
    * deterministic assignment by `orderCol`, full-row-tiebroken in-shard
    * ordering. */
  def exportJsonl(df: DataFrame, path: String, shards: Int,
      orderCol: String, compress: Boolean = false): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val tiebreak = df.columns.filterNot(_ == orderCol).map(col)
    val w = df.repartition(shards, col(orderCol))
      .sortWithinPartitions(col(orderCol) +: tiebreak: _*)
      .write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** Per-shard manifest of an exported directory: file name, row count,
    * and an order-independent content checksum (sum of per-line xxhash64
    * in DECIMAL — explicit wide arithmetic, so the aggregation cannot
    * overflow regardless of the session's ANSI setting) — one small
    * aggregation over the export, no driver-side row handling. */
  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.format("text").load(path)
      .select(input_file_name().as("file"), col("value"))
      .select(element_at(split(col("file"), "/"), -1).as("shard"),
        xxhash64(col("value")).cast("decimal(38,0)").as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h")).cast("decimal(38,0)").as("checksum"))

  /** Write the manifest INTO the export directory as `_MANIFEST.json`
    * (underscore-prefixed, so Spark readers skip it), through the Hadoop
    * FileSystem API so any destination the export itself supports works.
    * Driver-side write of a #shards-row summary — bounded by file count,
    * never data. */
  def writeManifest(spark: SparkSession, path: String): Unit = {
    val rows = manifest(spark, path).orderBy(col("shard")).collect()
    val json = rows.map { r =>
      s"""{"shard":"${r.getString(0)}","n_rows":${r.getLong(1)},""" +
        s""""checksum":${r.getDecimal(2).toBigInteger}}"""
    }.mkString("[\n", ",\n", "\n]")
    val target = new HPath(new HPath(path), "_MANIFEST.json")
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    graft.core.SmallFiles.write(fs, target, json)
  }

  /** Validate a delivered export against its own `_MANIFEST.json`:
    * recompute [[manifest]] from the shard files on disk and compare per
    * shard in BOTH directions. Returns the discrepancies — empty means
    * verified: `missing_shard` (in the manifest, not on disk),
    * `unexpected_shard` (on disk, not in the manifest),
    * `row_count_mismatch`, and `checksum_mismatch` (any corrupted line
    * shifts the per-shard xxhash64 sum). The manifest itself is a
    * #shards-row file read through the Hadoop FS (underscore files are
    * hidden from Spark path listings by design); the recompute is the
    * same single aggregation the manifest was built from. */
  def verifyExport(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val target = new HPath(new HPath(path), "_MANIFEST.json")
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val text = graft.core.SmallFiles.read(fs, target)
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("n_rows", LongType),
      StructField("checksum", DecimalType(38, 0))))
    val expected = spark.read.schema(schema)
      .json(spark.createDataset(Seq(text))(
        org.apache.spark.sql.Encoders.STRING))
      .select(col("shard"), col("n_rows").as("expected_rows"),
        col("checksum").as("expected_checksum"),
        lit(true).as("__in_manifest"))
    val actual = manifest(spark, path)
      .select(col("shard"), col("n_rows").as("actual_rows"),
        col("checksum").as("actual_checksum"), lit(true).as("__on_disk"))
    // presence flags discriminate the sides; value compares are null-SAFE
    // (<=>) so a manifest entry with a null or absent field FAILS
    // verification instead of nulling out the when() chain
    expected.join(actual, Seq("shard"), "full_outer")
      .withColumn("status",
        when(col("__in_manifest").isNull, lit("unexpected_shard"))
          .when(col("__on_disk").isNull, lit("missing_shard"))
          .when(!(col("expected_rows") <=> col("actual_rows")),
            lit("row_count_mismatch"))
          .when(!(col("expected_checksum") <=> col("actual_checksum")),
            lit("checksum_mismatch")))
      .filter(col("status").isNotNull)
      .select(col("shard"), col("status"), col("expected_rows"),
        col("actual_rows"), col("expected_checksum"), col("actual_checksum"))
  }
}
