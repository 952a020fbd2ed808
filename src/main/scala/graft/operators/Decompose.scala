package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition per key over a regular
  * series (the moving-average method behind `decompose()` in every
  * stats package; STL's fixed-window ancestor):
  *
  *   trend    = centered rolling mean (±halfWin rows)
  *   seasonal = per-phase mean of (value − trend), re-centered so the
  *              period sums to ~0 (the identifiability convention)
  *   residual = value − trend − seasonal
  *
  * The "where did this metric's movement come from" readout — drift
  * screens ([[ChangeDetect]]) fire on level shifts; this splits the
  * level into calendar structure vs trend vs noise first, so a weekly
  * rhythm never masquerades as drift.
  *
  * Exactness: cents quantization, then every mean is an exact
  * integral division at micro scale (toward-zero — the rounding Spark
  * `%` and DuckDB `//` share; detrended values are signed). Phase
  * means and their re-centering adjustment are integer micro values,
  * so all three components are exact longs and the output is
  * engine-portable bit for bit.
  *
  * Shape at 100 TB: one window sort per key covers the rolling mean;
  * the phase table is (keys × period)-bounded and broadcast-joins
  * back. Callers aggregate the raw corpus to the (key, pos) grid
  * first — that aggregate is the only corpus-scale pass. */
object Decompose {

  /** Decompose (keyCol, posCol, valueCol) rows — pos must be a dense
    * 0-based index within each key (gaps shift phases; fill first).
    * Output: key, pos, value, trend_micro/trend, seasonal_micro/
    * seasonal, resid_micro/resid — trend (and so seasonal/resid) is
    * null where the centered window is truncated by a series edge
    * (< 2·halfWin+1 rows). */
  def additive(df: DataFrame, keyCol: String, posCol: String,
      valueCol: String, period: Int, halfWin: Int,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(halfWin >= 1, s"halfWin must be >= 1, got $halfWin")
    val full = 2 * halfWin + 1
    def div(num: Column, den: Column): Column =
      ((num - num % den) / den).cast("decimal(38,0)").cast("long")
    val i38 = (c: Column) => c.cast("decimal(38,0)")
    val cents = (col(valueCol).cast("decimal(18,2)") * lit(100))
      .cast("long")
    val wRoll = Window.partitionBy(col(keyCol)).orderBy(col(posCol))
      .rowsBetween(-halfWin, halfWin)
    // trend: centered rolling mean, micro units; null at the edges
    // (a shrunken window would bias the ends — the classical choice)
    val base = scope.retain(df
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(posCol), col(valueCol), cents.as("__c"))
      .withColumn("__wn", count(lit(1)).over(wRoll))
      .withColumn("trend_micro",
        when(col("__wn") === full,
          div(i38(sum(col("__c")).over(wRoll)) * 10000L, col("__wn")))))
    // per-phase mean of the detrended interior, then re-centered
    val detr = base.filter(col("trend_micro").isNotNull)
      .select(col(keyCol), (col(posCol) % period).as("__ph"),
        (col("__c") * 10000L - col("trend_micro")).as("__d"))
    val phase = detr.groupBy(col(keyCol), col("__ph"))
      .agg(div(i38(sum(col("__d"))), count(lit(1))).as("__pm"))
    val adj = phase.groupBy(col(keyCol))
      .agg(div(i38(sum(col("__pm"))), count(lit(1))).as("__adj"))
    val seas = phase.join(adj, Seq(keyCol))
      .select(col(keyCol), col("__ph"),
        (col("__pm") - col("__adj")).as("seasonal_micro"))
    // left join: a key shorter than the window has no interior (no
    // phase table) — its rows survive with null components
    base
      .withColumn("__ph", col(posCol) % period)
      .join(broadcast(seas.withColumnRenamed(keyCol, "__k2")
          .withColumnRenamed("__ph", "__ph2")),
        col(keyCol) === col("__k2") && col("__ph") === col("__ph2"),
        "left")
      .select(col(keyCol), col(posCol), col(valueCol),
        col("trend_micro"), col("seasonal_micro"),
        (col("__c") * 10000L - col("trend_micro") -
          col("seasonal_micro")).as("resid_micro"))
      .withColumn("trend", col("trend_micro").cast("double") / 1.0e6)
      .withColumn("seasonal",
        col("seasonal_micro").cast("double") / 1.0e6)
      .withColumn("resid", col("resid_micro").cast("double") / 1.0e6)
  }
}
