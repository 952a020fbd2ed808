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

  /** Interval-overlap join: pairs where `[lLo,lHi]` and `[rLo,rHi]`
    * intersect (inclusive), optionally restricted to equal `keys`.
    *
    * Both sides explode into their covering bands and equi-join on
    * (keys, band). An overlapping pair shares every band in
    * `[max(lo-bands), min(hi-bands)]`; emitting it only from the FIRST
    * shared band (`band == greatest(left-lo-band, right-lo-band)`)
    * reports each pair exactly once with no distinct pass. */
  def overlapJoin(
      left: DataFrame, right: DataFrame,
      lLoCol: String, lHiCol: String, rLoCol: String, rHiCol: String,
      width: Double, keys: Seq[String] = Nil): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    val l = left
      .withColumn("__l_lo_band", band(col(lLoCol), width))
      .withColumn("__band",
        explode(sequence(band(col(lLoCol), width), band(col(lHiCol), width))))
    val r = right
      .withColumn("__r_lo_band", band(col(rLoCol), width))
      .withColumn("__band",
        explode(sequence(band(col(rLoCol), width), band(col(rHiCol), width))))
    l.join(r, keys :+ "__band")
      .filter(col("__band") === greatest(col("__l_lo_band"), col("__r_lo_band")))
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .drop("__band", "__l_lo_band", "__r_lo_band")
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
