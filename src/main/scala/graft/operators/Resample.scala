package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-key daily calendars and forward
  * filling — the "turn an event log into a dense daily panel" step every
  * indicator pipeline needs (the reference's domain ships monthly/daily
  * government series with holes; models and joins downstream want a row
  * per period).
  *
  * Shape at scale: the calendar is generated IN-ROW per key (sequence +
  * explode of one (key, min, max) row — never a driver-side date loop,
  * never a cross join against a calendar table), so the only shuffles
  * are the per-key min/max aggregation and the fill window's key sort.
  * Output size is Σ per-key spans — the caller controls it with the
  * key's natural horizon.
  */
object Resample {

  /** One row per (key, day) from each key's first to last observed day:
    * the dense daily calendar of `df`'s keys. */
  def dailyCalendar(df: DataFrame, keyCol: String,
      dateCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 day"))).as("day"))

  /** Forward-fill `valueCol` within each key partition ordered by
    * `orderCol`: NULL rows take the latest preceding non-NULL value
    * (leading NULLs stay NULL). One window pass. */
  def fillForward(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, as: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** The composed panel: per (key, day) aggregate of `valueExpr` over
    * `df`, densified to each key's daily calendar; absent days carry
    * n = 0, a NULL aggregate, and the forward-filled last aggregate.
    * Output: (key, day, n, agg_value, ffill_value). */
  def dailyPanel(df: DataFrame, keyCol: String, tsCol: String,
      valueExpr: Column): DataFrame = {
    val obs = df
      .withColumn("day", col(tsCol).cast("date"))
      .groupBy(col(keyCol), col("day"))
      .agg(count(lit(1)).as("n"), valueExpr.as("agg_value"))
    val dense = dailyCalendar(
        df.select(col(keyCol), col(tsCol).cast("date").as("d")),
        keyCol, "d")
      .join(obs, Seq(keyCol, "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    fillForward(dense, Seq(keyCol), "day", "agg_value", "ffill_value")
  }
}
