package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geographic coordinate repair — Spark restatement of GeoPointDataCleaner
  * (patchwork.py:414-605).
  *
  * Rule order mirrors the reference: decimal-separator repair -> numeric
  * parse (unparseable -> null) -> Brazil-band misscale repair (values
  * recorded as integer microdegrees, divided by 1e5) -> validity clamp
  * (out-of-range -> null). WKT rendering uses DECIMAL(12,5) string casts —
  * stable across engines, unlike printf-style float formatting.
  */
object GeoFunctions {

  /** Comma-decimal repair + parse; unparseable strings become null
    * (patchwork.py:445-471). Relies on non-ANSI cast (cast-failure=null). */
  def parseCoord(c: Column): Column =
    translate(trim(c), ",", ".").cast("double")

  // Brazil bounding bands used by the misscale fix (patchwork.py:490-544):
  // a coordinate like -1579911 is -15.79911 recorded in 1e-5 degrees.
  private val LatBand = (-34.0, 6.0)
  private val LonBand = (-74.0, -28.0)

  private def fixMisscale(d: Column, band: (Double, Double), limit: Double): Column = {
    val scaled = d / 1e5
    when(abs(d) > limit && scaled.between(band._1, band._2), scaled)
      .otherwise(d)
  }

  /** Latitude pipeline: parse -> misscale (|lat|>90, scaled into Brazil's
    * latitude band) -> range clamp [-90, 90] else null. */
  def cleanLat(c: Column): Column = {
    val d = fixMisscale(parseCoord(c), LatBand, 90.0)
    when(d.between(-90.0, 90.0), d).otherwise(lit(null))
  }

  /** Longitude pipeline: parse -> misscale (|lon|>180, scaled into Brazil's
    * longitude band) -> range clamp [-180, 180] else null. */
  def cleanLon(c: Column): Column = {
    val d = fixMisscale(parseCoord(c), LonBand, 180.0)
    when(d.between(-180.0, 180.0), d).otherwise(lit(null))
  }

  /** WKT `POINT(lon lat)` at 5 decimal places (patchwork.py:591-605),
    * rendered via decimal casts for engine-stable text. Null if either
    * coordinate is null. */
  def wktPoint(lon: Column, lat: Column): Column =
    when(lon.isNotNull && lat.isNotNull,
      concat(lit("POINT("),
        lon.cast("decimal(12,5)").cast("string"), lit(" "),
        lat.cast("decimal(12,5)").cast("string"), lit(")")))
      .otherwise(lit(null))
}
