package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition per key over a regular
  * series (the moving-average method of Macaulay 1931, behind
  * `decompose()` in every stats package; STL's fixed-window ancestor):
  *
  *   value = trend + seasonal + residual
  *
  * with the trend a centered moving average and the seasonal component
  * the per-phase mean of the detrended interior. The "where did this
  * metric's movement come from" readout — drift screens
  * ([[ChangeDetect]]) fire on level shifts; this splits the level into
  * calendar structure vs trend vs noise first, so a weekly rhythm never
  * masquerades as drift.
  *
  * ONE operator, TWO exactness modes (this file is the single home —
  * pick by the value column's type and the downstream need):
  *
  *  - [[additiveIntegral]] — INTEGER value series (pre-aggregate to
  *    counts/integer sums upstream). Every intermediate is an exact
  *    integer (window sums; detrended values scaled by the trend
  *    denominator) and each reported double is ONE IEEE division of two
  *    exact integers — engine-portable with no quantization step, and
  *    the trend uses the textbook period-length MA (even periods get
  *    the half-weight-endpoint 2×m form). Seasonal indexes are NOT
  *    re-centered: centering would subtract a mean of unordered doubles
  *    (engine-dependent summation order); it is a presentational shift —
  *    do it on the tiny (key, phase) table downstream if needed.
  *
  *  - [[additiveMicro]] — DECIMAL-valued series (money-like): cents
  *    quantization, then every mean is an exact integral division at
  *    micro scale (toward-zero — the rounding Spark `%` and DuckDB `//`
  *    share; detrended values are signed). All three components are
  *    exact micro longs (plus double renderings), the rolling window
  *    half-width is a free parameter (decoupled from the period), and
  *    the seasonal component IS re-centered so the period sums to ~0
  *    (the identifiability convention) — exact in integer micro units,
  *    so re-centering costs no portability here.
  *
  * Shape at 100 TB (both modes): one window sort per key covers the
  * rolling trend; the phase table is (keys × period)-bounded and joins
  * back broadcast-sized; callers aggregate the raw corpus to the
  * (key, pos) grid first — that aggregate is the only corpus-scale
  * pass. Feed a DENSE regular series (one row per tick, e.g. via
  * [[Resample.dailyCalendar]] + zero-fill); on a gapped series the
  * observed sequence still decomposes consistently on both engines,
  * but "period position" drifts from calendar meaning.
  */
object Decompose {

  /** Integer-exact decomposition of (keyCols, orderCol, valueCol) rows.
    * Output: the input columns + `period_pos` (0-based phase from
    * `posCol`), `trend` (centered MA, NULL within half a period of each
    * end), `seasonal` (per-phase mean detrended value), `resid`
    * (value − trend − seasonal, NULL where trend is).
    *
    * `posCol` gives the 0-based period position for a row (e.g.
    * `pmod(datediff(day, '1970-01-01'), 7)` for weekly-on-daily); it
    * must be a pure function of the order column so both engines agree.
    * `valueCol` must be integral — the scaled-integer exact form's
    * contract. */
  def additiveIntegral(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, period: Int,
      posCol: Column,
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

  /** Cents-micro decomposition of (keyCol, posCol, valueCol) rows —
    * pos must be a dense 0-based index within each key (gaps shift
    * phases; fill first). Output: key, pos, value, trend_micro/trend,
    * seasonal_micro/seasonal, resid_micro/resid — trend (and so
    * seasonal/resid) is null where the centered ±halfWin window is
    * truncated by a series edge (< 2·halfWin+1 rows). */
  def additiveMicro(df: DataFrame, keyCol: String, posCol: String,
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

  private def requireIntegral(df: DataFrame, c: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"Decompose.additiveIntegral value '$c' must be integral for the " +
        s"scaled-integer exact form, got $dt — pre-aggregate to counts " +
        "or fixed-point-scale upstream")
  }
}
