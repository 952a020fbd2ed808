package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. In a
  * production deployment these would be partitioned directories or JDBC
  * specs; the read path is identical (`spark.read.parquet` scales to any
  * number of files/partitions).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The driver testdata ships one single-row-group parquet file per
    * table, which Spark cannot split — every scan would otherwise run as
    * ONE task and serialize all map-side work (cleaners, text analysis)
    * onto a single core. A production 100 TB table arrives as thousands
    * of splits; this round-robin repartition restores that layout's
    * parallelism (one narrow shuffle of the compact columnar batch,
    * amortized across every downstream expression). Disable per-call for
    * pure scan->sink copies where the extra exchange buys nothing.
    */
  def load(spark: SparkSession, dir: String, name: String,
      parallelize: Boolean = true): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (parallelize && raw.rdd.getNumPartitions < spark.sparkContext.defaultParallelism / 2)
        raw.repartition(spark.sparkContext.defaultParallelism)
      else raw
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects; sessions set spark.sql.legacy.parquet.nanosAsLong=true and the
    // long is converted here (values are micro-precision, so this is
    // lossless). All downstream code sees a plain TimestampType.
    // Integer division: `/` would go through double and lose sub-us
    // precision at e15 epoch magnitudes.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (for the spark.sql passthrough
    * path, reference fast_etl.py:300-304 "arbitrary query" source). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
