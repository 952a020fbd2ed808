package graft.operators

import graft.SparkSpec

/** GeoJoin: the cell screen must lose no within-radius pair (vs brute
  * force), the argmin tie rule must be deterministic, and boundary /
  * null handling must match the contract. */
class GeoJoinSpec extends SparkSpec {

  private def df(name: String, idCol: String, latCol: String,
      lonCol: String, rows: Seq[(Long, Double, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF(idCol, latCol, lonCol)
  }

  private def flatKm(aLat: Double, aLon: Double, bLat: Double, bLon: Double) =
    math.sqrt((aLat - bLat) * (aLat - bLat) + (aLon - bLon) * (aLon - bLon)) *
      GeoJoin.KmPerDeg

  test("pairsWithinRadius equals brute force on random points (incl. negatives)") {
    val rnd = new scala.util.Random(42)
    def pts(n: Int) = (1L to n).map(i =>
      (i, rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 40 - 20))
    val probes = pts(200)
    val sites = pts(60)
    val radius = 150.0
    val got = GeoJoin.pairsWithinRadius(
        df("p", "pid", "plat", "plon", probes), "pid", "plat", "plon",
        df("s", "sid", "slat", "slon", sites), "sid", "slat", "slon",
        radius)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (p, plat, plon) <- probes
      (s, slat, slon) <- sites
      if flatKm(plat, plon, slat, slon) <= radius
    } yield (p, s)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("nearest picks the true minimum; equidistant ties go to smaller site id") {
    val probes = df("p", "pid", "plat", "plon", Seq((1L, 0.0, 0.0)))
    // Sites 7 and 3 are exactly equidistant from the probe; 9 is closer.
    val sites = df("s", "sid", "slat", "slon",
      Seq((7L, 0.5, 0.0), (3L, -0.5, 0.0), (9L, 0.1, 0.1)))
    val out = GeoJoin.nearestWithinRadius(
        probes, "pid", "plat", "plon", sites, "sid", "slat", "slon", 200.0)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 9L)

    val noNine = GeoJoin.nearestWithinRadius(
        probes, "pid", "plat", "plon",
        sites.filter("sid != 9"), "sid", "slat", "slon", 200.0)
      .collect()
    assert(noNine.head.getLong(1) == 3L, "equidistant tie must go to min id")
  }

  test("radius boundary is inclusive; out-of-range probes are absent") {
    // Site exactly radius away: 1 degree of lat = 111.32 km.
    val probes = df("p", "pid", "plat", "plon",
      Seq((1L, 0.0, 0.0), (2L, 50.0, 50.0)))
    val sites = df("s", "sid", "slat", "slon", Seq((5L, 1.0, 0.0)))
    val out = GeoJoin.nearestWithinRadius(
        probes, "pid", "plat", "plon", sites, "sid", "slat", "slon",
        GeoJoin.KmPerDeg)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    assert(out.head.getDouble(2) == GeoJoin.KmPerDeg)
  }

  test("null coordinates never match") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, Some(0.0), Some(0.0)), (2L, None, Some(0.0)))
      .toDF("pid", "plat", "plon")
    val sites = Seq((5L, Some(0.0), Some(0.0)), (6L, Some(0.0), None))
      .toDF("sid", "slat", "slon")
    val out = GeoJoin.pairsWithinRadius(
        probes, "pid", "plat", "plon", sites, "sid", "slat", "slon", 500.0)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 5L)))
  }

  test("cell-edge straddle: points in adjacent cells still pair") {
    // radius 111.32 km -> cellDeg = 1.0; probe at 0.95, site at 1.05 are
    // in different cells but only ~0.1 degrees apart.
    val probes = df("p", "pid", "plat", "plon", Seq((1L, 0.95, 0.0)))
    val sites = df("s", "sid", "slat", "slon", Seq((5L, 1.05, 0.0)))
    val out = GeoJoin.pairsWithinRadius(
        probes, "pid", "plat", "plon", sites, "sid", "slat", "slon",
        GeoJoin.KmPerDeg)
      .collect()
    assert(out.length == 1)
  }
}
