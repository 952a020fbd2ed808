package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((1L, "hello", Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("id", "s", "a", "b").createOrReplaceTempView("ext_t")
    val row = spark.sql(
      """SELECT rolling_hash(s) AS rh, float_dot(a, b) AS fd,
        |       decimal_dot(a, b) AS dd,
        |       int_dot(array(2, 3), array(5, 7)) AS qd FROM ext_t""".stripMargin)
      .collect().head
    assert(row.getAs[Long]("rh") ==
      functions.RollingHashExpr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello")))
    assert(row.getAs[Double]("fd") == 11.0)
    assert(row.getAs[java.math.BigDecimal]("dd").doubleValue() == 11.0)
    assert(row.getAs[Long]("qd") == 31L)
  }

  test("dot products null-poison on length mismatch or null elements") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT int_dot(array(1, 2, 3), array(1, 2)) AS mismatch,
        |       int_dot(array(1, CAST(NULL AS INT)), array(1, 1)) AS nullel,
        |       float_dot(CAST(array(1, 2) AS ARRAY<FLOAT>),
        |                 CAST(array(1) AS ARRAY<FLOAT>)) AS fmismatch
        |""".stripMargin).collect().head
    // a ragged or null-carrying pair must surface as NULL, not a silently
    // truncated/zero-padded "exact" result
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("withExtensions wiring registers the functions at session build") {
    // the extensions instance applies cleanly to a fresh builder
    val e = new GraftExtensions
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    e.apply(ext) // must not throw; function injection is deferred to build
    assert(GraftExtensions.functions.map(_._1) ==
      Seq("rolling_hash", "float_dot", "decimal_dot", "int_dot",
        "jaro_winkler", "geo_dist", "compress_ratio",
        "unicode_normalize"))
  }
}
