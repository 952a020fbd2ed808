package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seasonal-naive forecast evaluation (MASE — Hyndman & Koehler 2006,
  * "Another look at measures of forecast accuracy").
  *
  * The monitoring question every pipeline owner asks of a daily volume
  * series: "is this series predictable, and did today break the
  * pattern?" The scale-free answer is MASE: the mean absolute error of
  * the season-lag forecast (ŷ_t = y_{t-m}) divided by the mean absolute
  * error of the naive one-step forecast (ŷ_t = y_{t-1}) on the same
  * days. MASE < 1 ⇒ the weekly pattern beats plain persistence.
  *
  * Exactness: daily counts are integers, so both numerators are exact
  * integer sums; the single division happens once at the end in
  * doubles — the whole row replays bit-identically in any engine.
  *
  * Scale shape: one groupBy to the (key, day) grain — after which the
  * series table is tiny relative to the corpus — then two lags over one
  * window sort and one final aggregate. */
object ForecastEval {

  /** Per-key seasonal-naive evaluation over daily event counts.
    * Output: key, n_days (scored days: both lags defined), mae_seasonal,
    * mae_naive (doubles), mase (null when the naive error is 0).
    *
    * The lags are ROW lags over the observed-day series: a day with
    * zero events is absent, so on sparse series "season back" means
    * "season OBSERVED days back". For calendar-true seasonality over
    * gappy data, densify first ([[Resample]] at 1-day grain with a
    * zero fill) and feed the densified counts here. */
  def seasonalNaiveDaily(
      df: DataFrame, keyCol: String, tsCol: String,
      season: Int): DataFrame = {
    require(season >= 2, s"season must be >= 2, got $season")
    val daily = df
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
    val scored = daily
      .withColumn("y_season", lag(col("y"), season).over(w))
      .withColumn("y_prev", lag(col("y"), 1).over(w))
      .filter(col("y_season").isNotNull && col("y_prev").isNotNull)
    scored.groupBy(col("k").as(keyCol))
      .agg(
        count(lit(1)).as("n_days"),
        sum(abs(col("y") - col("y_season"))).as("__se"),
        sum(abs(col("y") - col("y_prev"))).as("__ne"))
      .select(
        col(keyCol),
        col("n_days"),
        (col("__se").cast("double") / col("n_days").cast("double"))
          .as("mae_seasonal"),
        (col("__ne").cast("double") / col("n_days").cast("double"))
          .as("mae_naive"),
        when(col("__ne") =!= 0,
          col("__se").cast("double") / col("__ne").cast("double"))
          .as("mase"))
  }
}
