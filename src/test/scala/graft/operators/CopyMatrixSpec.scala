package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.IO

/** The reference's parametrized copy matrix (§5: {pg,mssql} x {pg,mssql} x
  * {pre-exists, auto-create}, test_db_to_db_operator.py:123-199) restated
  * over this environment's stores: {parquet, csv} sources x {parquet, csv,
  * jdbc} sinks, pre-created and auto-created destinations, all through
  * FullCopy.align + the IO registry, equality-checked against the source.
  */
class CopyMatrixSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftmx;create=true"
  private lazy val tmp = Files.createTempDirectory("graft-matrix").toString

  private lazy val source: DataFrame =
    (1 to 300).map(i => (i.toLong, s"name_$i", i * 1.5, i % 2 == 0))
      .toDF("id", "name", "score", "active")

  private def normalized(df: DataFrame): Set[(Long, String, Double, Boolean)] =
    df.select(col("id").cast("long"), col("name"),
        col("score").cast("double"), col("active").cast("boolean"))
      .as[(Long, String, Double, Boolean)].collect().toSet

  private lazy val golden = normalized(source)

  for (srcKind <- Seq("parquet", "csv")) {
    for (sinkKind <- Seq("parquet", "csv", "jdbc")) {
      test(s"full copy $srcKind -> $sinkKind matches the source golden") {
        // stage the source in its format
        val srcPath = s"$tmp/src_${srcKind}_$sinkKind"
        val src: DataFrame = srcKind match {
          case "parquet" =>
            source.write.mode("overwrite").parquet(srcPath)
            IO.ParquetSource(srcPath).read(spark)
          case "csv" =>
            source.write.mode("overwrite").option("header", true).csv(srcPath)
            IO.CsvSource(srcPath).read(spark)
        }
        val aligned = FullCopy.align(src, source.columns.toIndexedSeq)
        val back: DataFrame = sinkKind match {
          case "parquet" =>
            val p = s"$tmp/dst_${srcKind}_parquet"
            IO.ParquetSink(p).write(aligned, truncate = true)
            IO.ParquetSource(p).read(spark)
          case "csv" =>
            val p = s"$tmp/dst_${srcKind}_csv"
            IO.CsvSink(p).write(aligned, truncate = true)
            IO.CsvSource(p).read(spark)
          case "jdbc" =>
            val table = s"mx_${srcKind}_dst"
            IO.JdbcSink(url, table).write(aligned, truncate = false)
            IO.JdbcSource(url, table = Some(table)).read(spark)
        }
        assert(normalized(back) == golden)
      }
    }
  }

  test("auto-created vs pre-created destination parity (jdbc)") {
    // pre-create by writing a schema-compatible empty frame, then append
    IO.JdbcSink(url, "mx_pre").write(source.limit(0), truncate = false)
    IO.JdbcSink(url, "mx_pre").write(source, truncate = false)
    // auto-create straight from data
    IO.JdbcSink(url, "mx_auto").write(source, truncate = false)
    val pre = IO.JdbcSource(url, table = Some("mx_pre")).read(spark)
    val auto = IO.JdbcSource(url, table = Some("mx_auto")).read(spark)
    assert(normalized(pre) == golden && normalized(auto) == golden)
  }
}
