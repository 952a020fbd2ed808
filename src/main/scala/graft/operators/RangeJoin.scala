package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketized) range join: `points.v BETWEEN intervals.lo AND
  * intervals.hi` re-expressed as an equi-join so it shuffles instead of
  * falling into a broadcast-nested-loop / cartesian plan.
  *
  * Technique: pick a band width `w`. Each point belongs to exactly one
  * band `floor(v/w)`; each interval is exploded to the sequence of bands
  * it touches, `floor(lo/w)..floor(hi/w)`. A matching (point, interval)
  * pair necessarily shares the point's band, so an equi-join on the band
  * id followed by the exact BETWEEN filter is lossless, and no pair can
  * appear twice (a point is in one band only).
  *
  * Scale: the join becomes a hash-shuffle on band ids — both sides scale
  * out — and the pair space is bounded by per-band density rather than
  * |points| x |intervals|. Pick `w` of the same order as the typical
  * interval length: each interval then explodes into O(1) bands (skew on
  * a band means data genuinely concentrates there; AQE skew-join splits
  * it). A plain BETWEEN join in Spark has no equi-key and plans as
  * BroadcastNestedLoopJoin — fine only when one side is tiny.
  */
object RangeJoin {

  private def band(c: Column, width: Double): Column =
    floor(c / lit(width)).cast("long")

  /** Join `points` to `intervals` on `lo <= v <= hi` (inclusive both
    * ends). Returns all columns of both inputs; callers project after.
    * Column names must not collide across the two inputs. */
  def bandJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      width: Double): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    val p = points.withColumn("__band", band(col(pointCol), width))
    val i = intervals.withColumn("__band",
      explode(sequence(band(col(loCol), width), band(col(hiCol), width))))
    p.join(i, "__band")
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__band")
  }

  /** Convenience for symmetric tolerance joins (`|v - center| <= tol`):
    * the interval side carries a center column instead of lo/hi. */
  def toleranceJoin(
      points: DataFrame, centers: DataFrame,
      pointCol: String, centerCol: String, tol: Double,
      width: Double): DataFrame = {
    val withBounds = centers
      .withColumn("__lo", col(centerCol) - lit(tol))
      .withColumn("__hi", col(centerCol) + lit(tol))
    bandJoin(points, withBounds, pointCol, "__lo", "__hi", width)
      .drop("__lo", "__hi")
  }
}
