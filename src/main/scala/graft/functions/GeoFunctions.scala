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

  // ------------------------------------------------------------- geohash
  // Geohash cell key as pure integer bit math (beyond-reference; public
  // algorithm, en.wikipedia.org/wiki/Geohash). The textbook per-bit
  // bisection loop IS the binary expansion of the normalized coordinate,
  // so the whole hash is: bin each axis to n bits, Morton-interleave
  // with longitude at the MSB, render 5-bit groups through the base-32
  // alphabet. Stays inside whole-stage codegen (shifts/masks/substr
  // built-ins only) and replays bit-exactly in any engine with 64-bit
  // integer ops — which is what q_geohash's oracle does.
  //
  // Geohash prefixes are THE practical spatial-locality key at scale:
  // `groupBy(geohash_k)` is a spatial bin, a prefix filter is a box
  // probe, and sorting by geohash is a ready-made space-filling-curve
  // layout (same payoff ZOrder.layout measures).

  private val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Spread the low 32 bits of `c` to even bit positions (64-bit Morton
    * magic; the 32-bit generalization of ZOrder.spread16). */
  def spread32(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** Geohash of (lat, lon) at `precision` characters. Even precisions
    * only (each axis then contributes exactly 5·p/2 bits, so a single
    * symmetric interleave suffices; odd precisions need an asymmetric
    * bit budget — use the next even precision and truncate the string
    * if a 5-bit-odd cell is genuinely wanted). Coordinates outside the
    * valid range clamp to the edge cell, like the bisection loop. */
  def geohash(lat: Column, lon: Column, precision: Int = 8): Column = {
    require(precision >= 2 && precision <= 12 && precision % 2 == 0,
      s"geohash: precision must be even, in [2, 12]; got $precision")
    val bits = 5 * precision
    val n = bits / 2                       // bits per axis
    val cells = (1L << n).toDouble
    def bin(c: Column, lo: Double, span: Double): Column =
      least(greatest(floor((c - lit(lo)) / lit(span) * lit(cells))
        .cast("long"), lit(0L)), lit((1L << n) - 1))
    val z = shiftleft(spread32(bin(lon, -180.0, 360.0)), 1)
      .bitwiseOR(spread32(bin(lat, -90.0, 180.0)))
    val chars = (0 until precision).map { i =>
      lit(GeohashAlphabet).substr(
        shiftright(z, bits - 5 - 5 * i).bitwiseAND(lit(31L)).cast("int")
          + lit(1),
        lit(1))
    }
    concat(chars: _*)
  }
}
