package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout: the table is physically split
  * into `col=value/` directories so a filter on the partition column
  * prunes whole directories at PLANNING time (PartitionFilters — zero
  * I/O for pruned partitions, before row-group or page pruning even
  * starts). At 100 TB this is the first-order scan optimization: a
  * day's query over a date-partitioned corpus reads one partition, not
  * the corpus.
  *
  * The writer pre-repartitions on the partition columns so each
  * partition directory is produced by one task — one file per
  * partition instead of tasks × partitions small-file shards (the
  * classic partitioned-write mistake that murders the namenode at
  * scale). For partitions too large for one comfortable file, pass
  * `maxRecordsPerFile`: the writer rolls to a new file at the bound
  * (deterministic row budget — the knob that actually expresses
  * "files of about this size", unlike salting, whose file count
  * degrades whenever salt groups collide into one shuffle partition).
  */
object PartitionedLayout {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 0L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Read back; partition pruning applies automatically to filters on
    * the partition columns. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
