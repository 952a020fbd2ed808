package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.SparkSpec
import graft.functions.GeoDistExpr
import graft.functions.GeoDistExpr.geo_dist

class GeoFilterRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    GraftExtensions.registerRules(spark)
    try f finally spark.experimental.extraOptimizations = prev
  }

  private val pts = (0 until 400).map { i =>
    (i.toLong, -10.0 + (i % 20) * 1.0, -50.0 + (i / 20) * 1.0)
  }

  test("radius filter results are unchanged by the rule") {
    val df = pts.toDF("id", "lat", "lon")
    val q = (d: org.apache.spark.sql.DataFrame) => d.filter(
      geo_dist(lit(-3.0), lit(-43.0), col("lat"), col("lon")) <= lit(500.0))
    val without = q(df).select("id").as[Long].collect().toSet
    val withR = withRule { q(df).select("id").as[Long].collect().toSet }
    assert(withR == without && without.nonEmpty)
    // boundary: a point at exactly the radius stays included
    val boundary = Seq((1L, 0.0, 0.0), (2L, 0.0, 1.0)).toDF("id", "lat", "lon")
    val r = GeoDistExpr.km(0.0, 0.0, 0.0, 1.0) // exact distance of point 2
    val ids = withRule {
      boundary.filter(
        geo_dist(lit(0.0), lit(0.0), col("lat"), col("lon")) <= lit(r))
        .select("id").as[Long].collect().toSet
    }
    assert(ids == Set(1L, 2L))
  }

  test("bounding box is pushed to the parquet scan") {
    val dir = Files.createTempDirectory("geo_rule").toFile.getAbsolutePath
    pts.toDF("id", "lat", "lon").write.mode("overwrite").parquet(dir)
    val plan = withRule {
      val df = spark.read.parquet(dir).filter(
        geo_dist(lit(-3.0), lit(-43.0), col("lat"), col("lon")) <= lit(200.0))
      df.collect() // force planning through AQE
      df.queryExecution.executedPlan.toString
    }
    // PushedFilters renders truncated, so assert the leading bound plus
    // the full conjunct set in the Filter node (all four bounds present).
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(lat"), plan)
    assert(plan.contains("lat#") && plan.contains("lon#"), plan)
    assert("\\(lat#\\d+ >= ".r.findFirstIn(plan).nonEmpty, plan)
    assert("\\(lon#\\d+ <= ".r.findFirstIn(plan).nonEmpty, plan)
  }

  test("rule is idempotent (fixed point after one application)") {
    val df = pts.toDF("id", "lat", "lon").filter(
      geo_dist(lit(-3.0), lit(-43.0), col("lat"), col("lon")) <= lit(200.0))
    val once = GeoFilterRule(df.queryExecution.analyzed)
    val twice = GeoFilterRule(once)
    assert(once == twice)
  }

  test("non-literal centers and other predicates are left untouched") {
    val df = pts.toDF("id", "lat", "lon")
    val moving = df.filter(
      geo_dist(col("lat"), col("lon"), col("lat"), col("lon")) <= lit(1.0))
    assert(GeoFilterRule(moving.queryExecution.analyzed) ==
      moving.queryExecution.analyzed)
    val plain = df.filter(col("lat") > 0.0)
    assert(GeoFilterRule(plain.queryExecution.analyzed) ==
      plain.queryExecution.analyzed)
  }

  test("geo_dist is callable from SQL") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT geo_dist(0.0, 0.0, 0.0, 1.0) AS d")
      .collect().head.getDouble(0)
    assert(v == 111.32)
  }
}
