package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition (the moving-average method
  * of Macaulay 1931, as in every intro forecasting text): per key,
  * value = trend + seasonal + residual, with the trend a centered
  * period-length moving average and the seasonal component the mean
  * detrended value at each position in the period.
  *
  * Engine-exact by construction — the scaled-integer discipline: for an
  * INTEGER value series, every intermediate stays an exact integer
  * (window sums, detrended values scaled by the period, per-position
  * sums), and each reported double is ONE IEEE division of two exact
  * integers — so results are bit-identical across engines with no
  * decimal rounding step (NOTES parity rule 7's philosophy applied to
  * windows). This is why `valueCol` must be integral: pre-aggregate to
  * counts/integer sums (or fixed-point-scale) upstream.
  *
  * Scale shape: one key-partitioned window sort (the same sort serves
  * the sum, count, lag and lead), one (key, position)-keyed aggregate
  * whose output is |keys| x period rows, and one broadcast-sized join
  * back. No driver loops, no per-period shuffle.
  *
  * Semantics notes: the window is ROWS-based — feed a DENSE regular
  * series (one row per period tick, e.g. via [[Resample.dailyCalendar]]
  * + zero-fill); on a gapped series both this and the oracle
  * consistently decompose the observed sequence, but "period position"
  * drifts from calendar meaning. Seasonal indexes are NOT re-centered
  * to sum to zero: centering subtracts a mean of unordered doubles
  * (engine-dependent summation order) and is a presentational shift —
  * do it on the tiny (key, position) table downstream if needed. */
object SeasonalDecompose {

  /** Decompose an integer-valued regular series. Output: the input key
    * + order columns with `n` (the value), `period_pos` (0-based
    * position within the period by order-column epoch), `trend`
    * (centered MA, NULL within half a period of each end), `seasonal`
    * (per-position mean detrended value), `resid`
    * (n - trend - seasonal, NULL where trend is).
    *
    * `posCol` gives the 0-based period position for a row (e.g.
    * `pmod(datediff(day, '1970-01-01'), 7)` for weekly-on-daily); it
    * must be a pure function of the order column so both engines agree.
    */
  def additive(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, period: Int,
      posCol: org.apache.spark.sql.Column,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(period >= 2, s"need period >= 2, got $period")
    requireIntegral(df, valueCol)
    val half = period / 2
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-half, half)
    val wRow = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))

    val v = col(valueCol).cast("long")
    // scaled trend numerator: exact integer, denominator `den`
    val (num, den) =
      if (period % 2 == 1)
        (sum(v).over(w), period.toLong)
      else {
        // even period: half-weight endpoints (the 2 x m MA) —
        // 2*sum(-m..m) - x[-m] - x[m], denominator 2*period
        (sum(v).over(w) * lit(2L) - lag(v, half).over(wRow) -
          lead(v, half).over(wRow), 2L * period)
      }
    val full = count(v).over(w) === lit((2 * half + 1).toLong)

    // retained: the windowed panel feeds both the seasonal aggregate
    // and the final join — without the persist the input chain (and
    // its window sort) runs twice (see CacheScope)
    val base = scope.retain(df
      .withColumn("period_pos", posCol.cast("int"))
      .withColumn("__num", when(full, num))
      .withColumn("trend", col("__num").cast("double") / lit(den.toDouble))
      // detrended, scaled by den: den*value - num — still exact integer
      .withColumn("__sdetr", when(col("__num").isNotNull,
        v * lit(den) - col("__num"))))

    // per (key, position) seasonal index: one division of exact sums
    val seas = base.filter(col("__sdetr").isNotNull)
      .groupBy((keyCols.map(col) :+ col("period_pos")): _*)
      .agg(sum(col("__sdetr")).as("__ssum"), count(lit(1)).as("__npos"))
      .withColumn("seasonal", col("__ssum").cast("double") /
        (col("__npos") * lit(den)).cast("double"))
      .drop("__ssum", "__npos")

    base
      .join(seas, keyCols :+ "period_pos", "left")
      .withColumn("resid",
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          v.cast("double") - col("trend") - col("seasonal")))
      .drop("__num", "__sdetr")
  }

  private def requireIntegral(df: DataFrame, c: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"SeasonalDecompose value '$c' must be integral for the " +
        s"scaled-integer exact form, got $dt — pre-aggregate to counts " +
        "or fixed-point-scale upstream")
  }
}
