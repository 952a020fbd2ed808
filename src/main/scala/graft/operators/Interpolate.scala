package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key linear interpolation of missing values over event time —
  * the gap-filling companion to `Resample.dailyPanel`'s forward fill.
  *
  * For each row with a NULL value, find the nearest non-null observation
  * before (v0 at t0) and after (v1 at t1) within the same key, and fill
  * `v0 + (v1 - v0) * ((t - t0) / (t1 - t0))`. Boundary rows with no
  * observation on one side stay NULL (interior-only interpolation — no
  * extrapolation). Rows that already have a value pass through
  * unchanged.
  *
  * Implementation: two window passes over ONE per-key sort-shuffle —
  * `last(..., ignoreNulls)` over the unbounded-preceding frame carries
  * (t0, v0) forward, `first(..., ignoreNulls)` over the
  * unbounded-following frame carries (t1, v1) backward; both frames use
  * the same partitioning and ordering so Catalyst plans a single Sort +
  * Exchange. Per-key state never materializes beyond the running frame.
  *
  * Engine-exactness: time enters the formula as epoch MICROS (exact
  * longs); the arithmetic is the fixed shape
  * `v0 + (v1 - v0) * (dt / dT)` over doubles — every op IEEE
  * correctly-rounded, so any engine replaying the same shape produces
  * bit-identical fills. Duplicate timestamps are ordered by `tieCol`;
  * if the bracketing observations share one timestamp (dT = 0) the fill
  * degenerates to v0 (guarded — no 0/0 NaN).
  */
object Interpolate {

  def linear(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String,
      outCol: String = "value_interp"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val before = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = when(col(valueCol).isNotNull,
      struct(unix_micros(col(tsCol)).as("t"), col(valueCol).as("v")))
    val dT = (col("__b1.t") - col("__b0.t")).cast("double")
    val dt = (unix_micros(col(tsCol)) - col("__b0.t")).cast("double")
    val fill = when(col("__b1.t") === col("__b0.t"), col("__b0.v"))
      .otherwise(col("__b0.v") +
        (col("__b1.v") - col("__b0.v")) * (dt / dT))
    df.withColumn("__b0", last(obs, ignoreNulls = true).over(before))
      .withColumn("__b1", first(obs, ignoreNulls = true).over(after))
      .withColumn(outCol,
        when(col(valueCol).isNotNull, col(valueCol))
          .when(col("__b0").isNotNull && col("__b1").isNotNull, fill))
      .drop("__b0", "__b1")
  }
}
