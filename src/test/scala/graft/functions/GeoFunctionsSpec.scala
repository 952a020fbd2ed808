package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Geo rules from patchwork.py:414-605 / FIXTURES.md A3. */
class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def latOf(values: String*): Seq[Option[Double]] =
    values.toDF("v").select(GeoFunctions.cleanLat(col("v")).as("c"))
      .collect().toIndexedSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("comma decimal separators are repaired") {
    assert(latOf("-15,79") == Seq(Some(-15.79)))
  }

  test("unparseable values become null") {
    assert(latOf("abc", "") == Seq(None, None))
  }

  test("Brazil-band misscaled microdegrees are divided by 1e5") {
    assert(latOf("-1579911") == Seq(Some(-15.79911)))
  }

  test("out-of-range latitude becomes null; reference band edges honored") {
    // 95e5 scales to 950 (outside the band) -> stays raw -> clamped null.
    assert(latOf("9500000") == Seq(None))
    // -91 IS inside the reference's misscale band (patchwork.py:492-501):
    // it gets divided by 1e5, reference-faithful even if surprising.
    assert(latOf("-91") == Seq(Some(-0.00091)))
    // 91 likewise (positive arm of the band).
    assert(latOf("91.0") == Seq(Some(0.00091)))
  }

  test("valid latitude passes through") {
    assert(latOf("45.5", "-33.0") == Seq(Some(45.5), Some(-33.0)))
  }

  test("out-of-range longitude becomes null; misscale repaired in lon band") {
    val lons = Seq("181.0", "-4599999")
      .toDF("v").select(GeoFunctions.cleanLon(col("v")).as("c"))
      .collect().toIndexedSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(lons == Seq(None, Some(-45.99999)))
  }

  test("wkt point renders at 5 decimal places, null-safe") {
    val rows = Seq(("-46.63331", "-23.55052"), (null, "-23.0"))
      .toDF("lon", "lat")
      .select(GeoFunctions.wktPoint(
        GeoFunctions.parseCoord(col("lon")),
        GeoFunctions.parseCoord(col("lat"))).as("w"))
      .collect().toIndexedSeq.map(r => Option(r.getString(0)))
    assert(rows == Seq(Some("POINT(-46.63331 -23.55052)"), None))
  }

  private def gh(lat: Double, lon: Double, p: Int = 8): String =
    Seq((lat, lon)).toDF("lat", "lon")
      .select(GeoFunctions.geohash(col("lat"), col("lon"), p))
      .collect().head.getString(0)

  test("geohash matches published vectors") {
    // en.wikipedia.org/wiki/Geohash worked examples
    assert(gh(57.64911, 10.40744) === "u4pruydq")
    assert(gh(-25.382708, -49.265506) === "6gkzwgjz")
    assert(gh(57.64911, 10.40744, 4) === "u4pr")
    assert(gh(57.64911, 10.40744, 2) === "u4")
  }

  test("geohash clamps edges and nests prefixes") {
    assert(gh(0.0, 0.0) === "s0000000")
    assert(gh(90.0, 180.0) === "zzzzzzzz")   // edge clamps to last cell
    assert(gh(-90.0, -180.0) === "00000000")
    // shorter precision is a strict prefix of the longer hash
    assert(gh(-25.382708, -49.265506, 6) ===
      gh(-25.382708, -49.265506, 8).take(6))
  }

  test("geohash rejects odd or out-of-range precision") {
    intercept[IllegalArgumentException] { gh(0, 0, 5) }
    intercept[IllegalArgumentException] { gh(0, 0, 14) }
  }
}
