package graft.enrich

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Row-pair distance enrichment — the reference's OSRM operator
  * (operators/osrm_distance_operator.py:100-235): select rows with both
  * coordinate pairs present (and, unless overwriting, distance still
  * null), call a routing service per row, write distances back by key.
  *
  * The HTTP fan-out is the one legitimately side-effecting "UDF" in the
  * whole system: `mapPartitions` with one client per partition replaces
  * the reference's 100-row chunk loop; partition sizing controls request
  * batching. `RouteService` is pluggable so the core path stays
  * offline-testable (SURVEY §7.5.5) — the default implementation is a
  * deterministic equirectangular approximation (pure *,+,sqrt — exact
  * IEEE, reproducible on any engine).
  */
object DistanceEnrichment {

  trait RouteService extends Serializable {
    /** Distance in km between (latA,lonA) and (latB,lonB). */
    def distanceKm(latA: Double, lonA: Double, latB: Double, lonB: Double): Double
  }

  /** Offline deterministic stand-in for the OSRM HTTP service: flat-earth
    * (equirectangular) distance, 111.32 km per degree. */
  object FlatEarthService extends RouteService {
    def distanceKm(latA: Double, lonA: Double, latB: Double, lonB: Double): Double = {
      val dLat = latA - latB
      val dLon = lonA - lonB
      math.sqrt(dLat * dLat + dLon * dLon) * 111.32
    }
  }

  /** P8 candidate filter: both pairs non-null; optionally only rows whose
    * distance is still null (overwrite_existing=False). */
  def candidates(
      df: DataFrame,
      latA: String, lonA: String, latB: String, lonB: String,
      distCol: String, overwriteExisting: Boolean): DataFrame = {
    val base = df.filter(
      col(latA).isNotNull && col(lonA).isNotNull &&
      col(latB).isNotNull && col(lonB).isNotNull)
    if (overwriteExisting) base else base.filter(col(distCol).isNull)
  }

  /** Enrich candidates with the computed distance via mapPartitions (one
    * service client per partition — the scale unit for external calls). */
  def enrich(
      df: DataFrame,
      latA: String, lonA: String, latB: String, lonB: String,
      outCol: String,
      service: RouteService = FlatEarthService): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, DoubleType))
    val (iA, jA, iB, jB) =
      (df.schema.fieldIndex(latA), df.schema.fieldIndex(lonA),
       df.schema.fieldIndex(latB), df.schema.fieldIndex(lonB))
    df.mapPartitions { it =>
      // One client per partition (reference: one HTTP session per chunk of
      // 100 rows; partition sizing is the batching knob here).
      val svc = service
      it.map { r =>
        val d = svc.distanceKm(
          r.getDouble(iA), r.getDouble(jA), r.getDouble(iB), r.getDouble(jB))
        Row.fromSeq(r.toSeq :+ d)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Expression-only variant of the flat-earth enrichment (preferred when
    * the service is pure math — stays inside codegen; used by the oracle
    * query; J7 write-back is then a plain merge on the key). */
  def enrichExpr(
      df: DataFrame,
      latA: String, lonA: String, latB: String, lonB: String,
      outCol: String): DataFrame =
    df.withColumn(outCol,
      sqrt(
        (col(latA) - col(latB)) * (col(latA) - col(latB)) +
        (col(lonA) - col(lonB)) * (col(lonA) - col(lonB))) * lit(111.32))
}
