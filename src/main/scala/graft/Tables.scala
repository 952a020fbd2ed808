package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for the spark.sql passthrough
    * path, reference fast_etl.py:300-304 "arbitrary query" source). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
