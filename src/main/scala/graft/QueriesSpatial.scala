package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GeoJoin

/** Spatial join queries: cell-bucketed nearest-site-within-radius over
  * coordinates synthesized deterministically from customer/supplier keys
  * (the q_distance coordSynth treatment — the tables carry no real
  * coordinates). The oracle is the brute-force cross join + per-probe
  * rank, so the hash compare proves the cell screen loses no pair and
  * the argmin tie rule matches.
  */
object QueriesSpatial {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val RadiusKm = 100.0

  private def probeSynth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      ((col("c_custkey") % 190).cast("double") / lit(10.0) - lit(9.5)).as("plat"),
      ((col("c_custkey") % 370).cast("double") / lit(10.0) - lit(18.5)).as("plon"))

  private def siteSynth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier").select(
      col("s_suppkey"),
      ((col("s_suppkey") % 170).cast("double") / lit(10.0) - lit(8.5)).as("slat"),
      ((col("s_suppkey") % 330).cast("double") / lit(10.0) - lit(16.5)).as("slon"))

  def qGeoNearest(s: SparkSession, dir: String): DataFrame =
    GeoJoin.nearestWithinRadius(
      probeSynth(s, dir), "c_custkey", "plat", "plon",
      siteSynth(s, dir), "s_suppkey", "slat", "slon",
      RadiusKm)

  val qGeoNearestSql: String =
    s"""WITH p AS (SELECT c_custkey,
       |    CAST(c_custkey % 190 AS DOUBLE) / 10.0 - 9.5 AS plat,
       |    CAST(c_custkey % 370 AS DOUBLE) / 10.0 - 18.5 AS plon
       |  FROM customer),
       |s AS (SELECT s_suppkey,
       |    CAST(s_suppkey % 170 AS DOUBLE) / 10.0 - 8.5 AS slat,
       |    CAST(s_suppkey % 330 AS DOUBLE) / 10.0 - 16.5 AS slon
       |  FROM supplier),
       |pairs AS (SELECT c_custkey, s_suppkey,
       |    sqrt((plat - slat) * (plat - slat) +
       |         (plon - slon) * (plon - slon)) * ${GeoJoin.KmPerDeg}
       |      AS dist_km
       |  FROM p CROSS JOIN s)
       |SELECT c_custkey, s_suppkey, dist_km FROM pairs
       |WHERE dist_km <= $RadiusKm
       |QUALIFY row_number()
       |  OVER (PARTITION BY c_custkey ORDER BY dist_km, s_suppkey) = 1""".stripMargin

  // ----------------------------------------------------------- geo radius
  // Point-radius query through the native geo_dist expression with
  // plans.GeoFilterRule active: the rule conjoins a sargable lat/lon
  // bounding box (scan-prunable at scale — GeoFilterRuleSpec pins the
  // PushedFilters), and because the box strictly contains the disc the
  // result set is IDENTICAL to the bare predicate — which is exactly
  // what the oracle (bare-predicate SQL replay, exact IEEE arithmetic)
  // verifies.
  def qGeoRadius(s: SparkSession, dir: String): DataFrame = {
    GraftExtensions.registerRules(s)
    probeSynth(s, dir)
      .withColumn("dist_km",
        graft.functions.GeoDistExpr.geo_dist(
          lit(-3.0), lit(-10.0), col("plat"), col("plon")))
      .filter(col("dist_km") <= lit(RadiusKm * 3))
      .select(col("c_custkey"), col("plat"), col("plon"), col("dist_km"))
  }

  val qGeoRadiusSql: String =
    s"""WITH p AS (SELECT c_custkey,
       |    CAST(c_custkey % 190 AS DOUBLE) / 10.0 - 9.5 AS plat,
       |    CAST(c_custkey % 370 AS DOUBLE) / 10.0 - 18.5 AS plon
       |  FROM customer)
       |SELECT c_custkey, plat, plon,
       |  sqrt((-3.0 - plat) * (-3.0 - plat) +
       |       (-10.0 - plon) * (-10.0 - plon)) * 111.32 AS dist_km
       |FROM p
       |WHERE sqrt((-3.0 - plat) * (-3.0 - plat) +
       |           (-10.0 - plon) * (-10.0 - plon)) * 111.32
       |      <= ${RadiusKm * 3}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_geo_nearest" -> (qGeoNearest _),
    "q_geo_radius" -> (qGeoRadius _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_geo_nearest" -> qGeoNearestSql,
    "q_geo_radius" -> qGeoRadiusSql,
  )
}
