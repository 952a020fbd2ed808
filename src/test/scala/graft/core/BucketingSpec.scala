package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-to-bucketed equi-join plans with no Exchange") {
    val left = (1L to 100L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bspec_left", Seq("k"), nBuckets = 4)
    Bucketing.writeBucketed(right, "bspec_right", Seq("k"), nBuckets = 4)

    val l = spark.table("bspec_left").hint("merge")
    val r = spark.table("bspec_right").hint("merge")
    val joined = l.join(r, "k")

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(joined.count() == 100L)

    val row = joined.filter(col("k") === 7L).collect().head
    assert(row.getAs[String]("lv") == "l7")
    assert(row.getAs[Double]("rv") == 14.0)
  }

  test("aggregation on the bucket key needs no Exchange either") {
    val df = (1L to 50L).map(i => (i % 10, i)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bspec_agg", Seq("k"), nBuckets = 4)
    val agg = spark.table("bspec_agg").groupBy("k").agg(sum("v").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed aggregation must not shuffle:\n$plan")
    assert(agg.count() == 10L)
  }

  test("one file per bucket (repartition aligns writers to buckets)") {
    val df = (1L to 40L).map(i => (i, i)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bspec_files", Seq("k"), nBuckets = 4)
    val ident = spark.sessionState.sqlParser
      .parseTableIdentifier("bspec_files")
    val loc = spark.sessionState.catalog.getTableMetadata(ident).location
    val files = new java.io.File(loc).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length == 4, files.map(_.getName).mkString(","))
  }
}
