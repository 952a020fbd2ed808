package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style conversion attribution over an event stream: for every
  * conversion event, the FIRST and the most recent (LAST) preceding touch
  * event of the same user — the two classic single-touch models.
  *
  * One per-user sort-shuffle: running `first`/`last(…, ignoreNulls)` over
  * (ts, tie) carry the earliest/latest touch struct forward; conversions
  * are then a filter. Same-timestamp touch-vs-conversion pairs resolve by
  * the tie column (a touch ordered before the conversion attributes, one
  * ordered after does not) — deterministic, engine-replayable.
  *
  * `maxLagUs` (optional) voids a LAST-touch older than the lag budget
  * (the common "30-day window" rule) — applied map-side after the window.
  * The FIRST touch is reported unwindowed (its model is "origin story",
  * not recency); callers wanting a windowed first touch filter upstream.
  */
object Attribution {

  /** Returns one row per conversion event: user, conversion id/ts, and
    * (first_touch_id, first_touch_ts, last_touch_id, last_touch_ts) —
    * NULL when the user has no touch before the conversion (or outside
    * `maxLagUs` for the last-touch pair). */
  def singleTouch(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, touchTypes: Seq[String],
      convType: String, maxLagUs: Option[Long] = None): DataFrame = {
    require(touchTypes.nonEmpty, "no touch types")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(unix_micros(col(tsCol)).as("t"), col(tieCol).as("id")))
    val tagged = df
      .filter(col(typeCol).isin(touchTypes :+ convType: _*))
      .withColumn("__ft", first(touch, ignoreNulls = true).over(w))
      .withColumn("__lt", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
    val lagOk = maxLagUs match {
      case Some(lag) =>
        unix_micros(col(tsCol)) - col("__lt.t") <= lit(lag)
      case None => lit(true)
    }
    tagged.select(
      col(userCol), col(tieCol).as("conv_id"), col(tsCol).as("conv_ts"),
      col("__ft.id").as("first_touch_id"),
      timestamp_micros(col("__ft.t")).as("first_touch_ts"),
      when(lagOk, col("__lt.id")).as("last_touch_id"),
      when(lagOk, timestamp_micros(col("__lt.t"))).as("last_touch_ts"))
  }
}
