package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Live JDBC roundtrip against embedded Derby (ships with Spark): the
  * K1/K2 write path and the S1/S3 read path, including the partitioned
  * read that replaces the reference's key-interval copy loop. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JDBC write + read roundtrip (K1 append, S1 table scan)") {
    val df = (1 to 100).map(i => (i.toLong, s"name_$i", i * 1.5))
      .toDF("id", "name", "score")
    IO.JdbcSink(url, "rt_table").write(df, truncate = false)

    val back = IO.JdbcSource(url, table = Some("rt_table")).read(spark)
    assert(back.count() == 100)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      df.as[(Long, String, Double)].collect().toSet)
  }

  test("JDBC partitioned read (S3 key-range semantics)") {
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    IO.JdbcSink(url, "part_table").write(df, truncate = false)

    val src = IO.JdbcSource(url, table = Some("part_table"),
      partitionColumn = Some("id"), lowerBound = Some(1L),
      upperBound = Some(1000L), numPartitions = Some(8))
    val back = src.read(spark)
    assert(back.rdd.getNumPartitions == 8)
    assert(back.count() == 1000)
    // the key-range predicate pushes into each partition's WHERE clause
    assert(back.filter(col("id").between(100, 200)).count() == 101)
  }

  test("JDBC query source (S2 passthrough)") {
    // Derby folds unquoted identifiers to uppercase. Spark created the
    // TABLE name unquoted (folded) but the COLUMNS quoted-lowercase, so
    // the passthrough query quotes columns only.
    val back = IO.JdbcSource(url,
      query = Some("""SELECT "id", "score" FROM rt_table WHERE "id" <= 10"""))
      .read(spark)
    assert(back.count() == 10)
    assert(back.columns.toSeq.map(_.toLowerCase) == Seq("id", "score"))
  }

  test("JDBC truncate-then-load keeps table, replaces rows (K2)") {
    val df1 = Seq((1L, "a")).toDF("id", "v")
    val df2 = Seq((2L, "b"), (3L, "c")).toDF("id", "v")
    IO.JdbcSink(url, "trunc_table").write(df1, truncate = false)
    IO.JdbcSink(url, "trunc_table").write(df2, truncate = true)
    val back = IO.JdbcSource(url, table = Some("trunc_table")).read(spark)
    assert(back.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }
}
