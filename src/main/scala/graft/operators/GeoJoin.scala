package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial nearest-neighbor join via cell bucketing — the scale path for
  * "closest site within R km of each probe" (reference scope: the geo
  * distance enrichment family, graft.enrich.DistanceEnrichment; this
  * operator replaces its implicit all-pairs shape with a bounded
  * candidate join).
  *
  * Metric: flat-earth equirectangular, `sqrt(dLat^2 + dLon^2) * kmPerDeg`
  * — identical to [[graft.enrich.DistanceEnrichment.FlatEarthService]],
  * so results line up with the enrichment family and the arithmetic is
  * engine-portable (one IEEE expression shape).
  *
  * Design (100 TB): both sides get integer cell ids on a grid whose cell
  * edge is >= the search radius in degrees, so every within-radius match
  * lies in the probe's 3x3 cell neighborhood. The SITE side (assumed the
  * smaller — store locations, dim tables) is exploded x9 to its
  * neighborhood; probes stay one row each. The join is then a plain
  * equi-join on (cell_x, cell_y): broadcastable when sites are small,
  * an ordinary bounded shuffle otherwise — NEVER |probes| x |sites|.
  * Candidate fan-out per probe is bounded by site density per cell; a
  * pathological all-sites-in-one-cell input degrades to the density
  * bound, not to a cross join.
  */
object GeoJoin {

  /** Km per degree at the equator — the flat-earth constant shared with
    * DistanceEnrichment. */
  val KmPerDeg = 111.32

  private def cellOf(c: Column, cellDeg: Double): Column =
    floor(c / lit(cellDeg)).cast("long")

  private def flatDistKm(latA: Column, lonA: Column,
      latB: Column, lonB: Column): Column =
    sqrt((latA - latB) * (latA - latB) + (lonA - lonB) * (lonA - lonB)) *
      lit(KmPerDeg)

  /** All (probe, site) pairs within `radiusKm`, with the exact distance.
    * Output: probe id, site id, dist_km. */
  def pairsWithinRadius(
      probes: DataFrame, probeId: String, pLat: String, pLon: String,
      sites: DataFrame, siteId: String, sLat: String, sLon: String,
      radiusKm: Double): DataFrame = {
    require(radiusKm > 0, s"radiusKm must be positive, got $radiusKm")
    val cellDeg = radiusKm / KmPerDeg
    val p = probes.select(col(probeId), col(pLat), col(pLon))
      .filter(col(pLat).isNotNull && col(pLon).isNotNull)
      .withColumn("cx", cellOf(col(pLat), cellDeg))
      .withColumn("cy", cellOf(col(pLon), cellDeg))
    // Site side exploded to its 3x3 neighborhood: a site in cell (x, y)
    // is a candidate for probes in any adjacent cell.
    val offsets = array((-1 to 1).map(lit): _*)
    val s = sites.select(col(siteId), col(sLat), col(sLon))
      .filter(col(sLat).isNotNull && col(sLon).isNotNull)
      .withColumn("dx", explode(offsets))
      .withColumn("dy", explode(offsets))
      .select(col(siteId), col(sLat), col(sLon),
        (cellOf(col(sLat), cellDeg) + col("dx")).as("cx"),
        (cellOf(col(sLon), cellDeg) + col("dy")).as("cy"))
    p.join(s, Seq("cx", "cy"))
      .withColumn("dist_km",
        flatDistKm(col(pLat), col(pLon), col(sLat), col(sLon)))
      .filter(col("dist_km") <= lit(radiusKm))
      .select(col(probeId), col(siteId), col("dist_km"))
  }

  /** Nearest site within `radiusKm` per probe (ties broken by smallest
    * site id — deterministic). Probes with no site in range are absent.
    * One aggregation over the candidate pairs: `min(struct(dist, id))`
    * partial-aggregates map-side, so the shuffle carries one row per
    * (partition, probe). */
  def nearestWithinRadius(
      probes: DataFrame, probeId: String, pLat: String, pLon: String,
      sites: DataFrame, siteId: String, sLat: String, sLon: String,
      radiusKm: Double): DataFrame =
    pairsWithinRadius(probes, probeId, pLat, pLon,
        sites, siteId, sLat, sLon, radiusKm)
      .groupBy(col(probeId))
      .agg(min(struct(col("dist_km"), col(siteId))).as("best"))
      .select(col(probeId),
        col(s"best.$siteId").as(siteId),
        col("best.dist_km").as("dist_km"))
}
