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

  // Brazil misscale bands, raw-value space, exactly the reference's
  // predicates (patchwork.py:492-544): a value like -1579911 is -15.79911
  // recorded in 1e-5 degrees. Latitude: (-35e5, -90) or (90, 5e5);
  // longitude: (-76e5, -29e5). Strict comparisons, like the reference.
  private val Scale = 1e5

  /** Latitude pipeline: parse -> misscale fix -> range clamp
    * ([-90, 90] inclusive; outside -> null — patchwork.py:546-564). */
  def cleanLat(c: Column): Column = {
    val d = parseCoord(c)
    val misscaled = (d > -35.0 * Scale && d < -90.0) ||
                    (d > 90.0 && d < 5.0 * Scale)
    val fixed = when(misscaled, d / Scale).otherwise(d)
    when(fixed.between(-90.0, 90.0), fixed).otherwise(lit(null))
  }

  /** Longitude pipeline: parse -> misscale fix (negative band only, like
    * the reference) -> range clamp [-180, 180] else null. */
  def cleanLon(c: Column): Column = {
    val d = parseCoord(c)
    val misscaled = d > -76.0 * Scale && d < -29.0 * Scale
    val fixed = when(misscaled, d / Scale).otherwise(d)
    when(fixed.between(-180.0, 180.0), fixed).otherwise(lit(null))
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
