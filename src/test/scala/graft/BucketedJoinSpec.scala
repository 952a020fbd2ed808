package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: both fact tables clustered into the same
  * bucket layout on the join key join WITHOUT an exchange — the
  * co-located-join strategy for repeated large-x-large joins at 100 TB
  * (pay the shuffle once at layout time, never per query). */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join runs without a shuffle exchange") {
    // force the fact-fact (non-broadcast) join strategy the demo is about
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinBody(): Unit = {
    // stale managed-table locations survive metastore resets in tests
    for (t <- Seq("li_b", "ord_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }

    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "lineitem", parallelize = false)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.load(spark, dir, "orders", parallelize = false)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.explainString(FormattedMode)
    // the join itself must not introduce a shuffle: the ONLY Exchange in
    // the whole plan is the one feeding the final aggregation. An
    // unbucketed join would add one Exchange per side (3 total).
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a join in:\n$plan")
    val nExchanges = "(?<!Reused)Exchange".r.findAllIn(plan
      .linesIterator.filter(_.trim.matches("\\(\\d+\\) .*")).mkString("\n")).size
    assert(nExchanges <= 1,
      s"join should be co-located (bucketed), found $nExchanges exchanges in:\n$plan")

    // and the result matches the unbucketed computation
    val expected = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)
  }
}
