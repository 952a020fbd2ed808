package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Reader/writer registry — the reference's connection layer
  * (SourceConnection/DestinationConnection, db_connection.py:64-130)
  * re-expressed as declarative reader specs. A "connection" becomes a
  * format + options bundle; partitioned JDBC reads subsume the
  * copy_by_key_interval machinery (copy_db_extensions.py:21-208).
  */
object IO {

  sealed trait Source { def read(spark: SparkSession): DataFrame }

  /** Parquet directory/file (S9). */
  final case class ParquetSource(path: String) extends Source {
    def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
  }

  /** CSV with the reference's spreadsheet conventions (S7/S8): header,
    * separator/encoding options, slugified canonical column names. */
  final case class CsvSource(
      path: String,
      separator: String = ",",
      encoding: String = "UTF-8",
      header: Boolean = true,
      slugifyHeaders: Boolean = true) extends Source {
    def read(spark: SparkSession): DataFrame = {
      val df = spark.read
        .option("header", header)
        .option("sep", separator)
        .option("encoding", encoding)
        .option("inferSchema", true)
        .csv(path)
      if (slugifyHeaders) Naming.slugifyColumns(df) else df
    }
  }

  /** JDBC table/query source (S1/S2), with the optional key-range
    * partition spec (S3: partitionColumn/bounds/numPartitions replace the
    * reference's BETWEEN-stepped loop; task retries replace S4's manual
    * retry wrapper; S5 limit/offset paging is subsumed entirely). */
  final case class JdbcSource(
      url: String,
      table: Option[String] = None,
      query: Option[String] = None,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Option[Int] = None,
      options: Map[String, String] = Map.empty) extends Source {
    require(table.isDefined != query.isDefined,
      "exactly one of table/query (db_connection.py:97-100)")
    def read(spark: SparkSession): DataFrame = {
      var r = spark.read.format("jdbc").option("url", url)
      table.foreach(t => r = r.option("dbtable", t))
      query.foreach(q => r = r.option("query", q))
      partitionColumn.foreach { pc =>
        r = r.option("partitionColumn", pc)
          .option("lowerBound", lowerBound.getOrElse(0L))
          .option("upperBound", upperBound.getOrElse(Long.MaxValue))
          .option("numPartitions", numPartitions.getOrElse(32))
      }
      options.foreach { case (k, v) => r = r.option(k, v) }
      r.load()
    }
  }

  sealed trait Sink { def write(df: DataFrame, truncate: Boolean): Unit }

  /** Parquet sink (K6). Truncate-then-load (K2) = Overwrite. */
  final case class ParquetSink(path: String) extends Sink {
    def write(df: DataFrame, truncate: Boolean): Unit =
      df.write.mode(if (truncate) SaveMode.Overwrite else SaveMode.Append)
        .parquet(path)
  }

  /** CSV extract sink (K4), with optional compression. */
  final case class CsvSink(
      path: String,
      compression: Option[String] = None) extends Sink {
    def write(df: DataFrame, truncate: Boolean): Unit = {
      var w = df.write
        .mode(if (truncate) SaveMode.Overwrite else SaveMode.Append)
        .option("header", true)
      compression.foreach(c => w = w.option("compression", c))
      w.csv(path)
    }
  }

  /** JDBC sink (K1/K2/K9): batched inserts are the `batchsize` option;
    * truncate-then-load maps to Overwrite+truncate (keeps the table and
    * its DDL); auto-create DDL synthesis is `createTableColumnTypes` from
    * the TypeMapper. Note the documented atomicity gap vs the reference's
    * single-transaction load (SURVEY §7.5.6): JDBC writes are
    * per-partition transactions. */
  final case class JdbcSink(
      url: String,
      table: String,
      dialect: Option[TypeMapper.Dialect] = None,
      batchSize: Int = 10000,
      options: Map[String, String] = Map.empty) extends Sink {
    def write(df: DataFrame, truncate: Boolean): Unit = {
      var w = df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchSize)
      dialect.foreach(d => w = w.option("createTableColumnTypes",
        TypeMapper.columnTypes(df.schema, d)))
      if (truncate) w = w.mode(SaveMode.Overwrite).option("truncate", true)
      else w = w.mode(SaveMode.Append)
      options.foreach { case (k, v) => w = w.option(k, v) }
      w.save()
    }
  }
}
