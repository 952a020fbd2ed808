package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key autocorrelation table: the serial-dependence diagnostic a
  * pipeline reads before trusting i.i.d.-assuming statistics (bootstrap
  * SEs, Welch tests) on time-ordered metrics, and the standard
  * seasonality probe next to `Decompose` (a spike at lag 7 on
  * daily data = weekly cycle).
  *
  * Definition (documented variant): ACF at lag l is the PEARSON
  * correlation over the lagged pairs (x_t, x_{t+l}) — each lag
  * normalizes by its own pair moments (the "corrByKey on lagged pairs"
  * form), which keeps every number inside the repo's engine-exact
  * contract: decimal partial sums + the fixed-shape double formula of
  * `Stats.corrByKey`. The classical estimator that divides every lag by
  * the GLOBAL variance differs by O(l/n); for gap diagnostics the
  * Pearson form is the more conservative of the two.
  *
  * Lags are INDEX-based over the (keyCol, orderCol) sort — a missing
  * period pairs with the previous PRESENT row. Resample upstream
  * (`Resample.toGrid`) when strict time-distance lags are required.
  *
  * Plan shape: all `maxLag` lag columns ride ONE window sort on
  * (key, order); the pairs unpivot is a map-side `inline` (CPU, not
  * shuffle); then one hash aggregation on (key, lag) with map-side
  * decimal partials. No join, no cross product, two keyed exchanges
  * (window sort + final aggregate).
  */
object AutoCorr {

  private def d(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Output: (keyCol, lag (1..maxLag), n (pair count), acf — null when
    * either side of the pair set has zero variance). */
  def acf(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val lagged = (1 to maxLag).foldLeft(
        df.select(col(keyCol), col(orderCol), col(valueCol))) {
      (acc, l) => acc.withColumn(s"__lag_$l", lag(col(valueCol), l).over(w))
    }
    val pairs = lagged.select(col(keyCol),
        inline(array((1 to maxLag).map(l =>
          struct(lit(l).as("lag"), col(s"__lag_$l").as("x"),
            col(valueCol).as("y"))): _*)))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val agg = pairs.groupBy(col(keyCol), col("lag")).agg(
      count(lit(1)).as("n"),
      sum(d(col("x"))).as("sx"), sum(d(col("y"))).as("sy"),
      sum(d(col("x")) * d(col("y"))).as("sxy"),
      sum(d(col("x")) * d(col("x"))).as("sxx"),
      sum(d(col("y")) * d(col("y"))).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    agg.select(col(keyCol), col("lag"), col("n"),
      when(varX > 0.0 && varY > 0.0,
        (n * sxy - sx * sy) / (sqrt(varX) * sqrt(varY))).as("acf"))
  }

  /** Ljung-Box portmanteau test per key (Ljung & Box 1978): is the
    * series white noise, or is there serial dependence at ANY lag up
    * to `maxLag`?
    *
    *   Q = n(n+2) Σ_{k=1..m} ρ̂²_k / (n−k),   χ²_m under H0
    *
    * with ρ̂_k the CLASSICAL autocorrelation estimator (global mean,
    * global variance denominator — the textbook Q uses this, unlike
    * [[acf]]'s per-lag Pearson variant). The pipeline gate before
    * trusting i.i.d.-assuming statistics on a time-ordered metric, and
    * the residual-whiteness check after a [[Decompose]] fit.
    *
    * Exactness: values quantize to integer cents; every moment (lag
    * cross-sums, totals, squares) is an exact integer; each ρ̂_k is ONE
    * double division of two exact integers (the n²-scaled expansion of
    * the global-mean estimator — no mean is ever materialized); and the
    * per-lag terms add in EXPLICIT ascending-lag left-associative
    * order, so the double chain is bit-identical on any engine.
    * Contract: the integer combinations (n²·Σx_t·x_{t−k} etc.) must
    * fit 38 digits — cents·√n per key below ~1e18, far beyond any
    * per-key grid this is meant for.
    *
    * Same plan shape as [[acf]]: ONE window sort carries every lag
    * column; one per-key hash aggregate carries totals and all per-lag
    * conditional sums; no join, no unpivot. Feed (key, pos)-grid
    * aggregates, not raw corpus rows.
    *
    * Output: (keyCol, n, q_stat — null when n ≤ maxLag or the series
    * is constant). */
  def ljungBox(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val i18 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,0)")
    val cents = (col(valueCol).cast("decimal(18,2)") * lit(100))
      .cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(orderCol), cents.as("__x"))
    val lagged = (1 to maxLag).foldLeft(base) {
      (acc, l) => acc.withColumn(s"__lag_$l", lag(col("__x"), l).over(w))
    }
    val perLag = (1 to maxLag).flatMap { k =>
      val xl = col(s"__lag_$k")
      Seq(
        sum(when(xl.isNotNull, i18(col("__x")) * i18(xl)))
          .as(s"__sxy_$k"),
        sum(when(xl.isNotNull, col("__x"))).as(s"__sy_$k"),
        sum(when(xl.isNotNull, xl)).as(s"__sxl_$k"))
    }
    val aggs = Seq(
      count(lit(1)).as("n"), sum(col("__x")).as("__T"),
      sum(i18(col("__x")) * i18(col("__x"))).as("__ss")) ++ perLag
    val tot = lagged.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val n38 = i18(col("n"))
    val t38 = i18(col("__T"))
    val den = (n38 * n38 * col("__ss") - n38 * t38 * t38).cast("double")
    val nD = col("n").cast("double")
    val terms = (1 to maxLag).map { k =>
      val num = (n38 * n38 * col(s"__sxy_$k") -
        n38 * t38 * (i18(col(s"__sy_$k")) + i18(col(s"__sxl_$k"))) +
        i18(col("n") - lit(k)) * t38 * t38).cast("double")
      val rho = num / den
      (rho * rho) / (nD - lit(k.toDouble))
    }
    // ascending-lag, left-associative — the deterministic double chain
    val qSum = terms.reduceLeft(_ + _)
    tot.select(col(keyCol), col("n"),
      when(col("n") > maxLag && den > 0.0,
        nD * (nD + lit(2.0)) * qSum).as("q_stat"))
  }

  /** Per-key CROSS-correlation table: Pearson correlation of
    * (x_{t−l}, y_t) for l = 0..maxLag — "does x lead y, and by how
    * much?", the lead–lag diagnostic between two aligned series (a
    * spike at l > 0 means x predicts y l periods ahead; lag 0 is plain
    * contemporaneous correlation). Same engine-exact contract, pair
    * semantics (index-based lags over the (key, order) sort; each lag
    * normalizes by its own pair moments) and plan shape as [[acf]]:
    * ONE window sort carries every lag column, the pair unpivot is
    * map-side `inline`, then one hash aggregate on (key, lag).
    *
    * Output: (keyCol, lag (0..maxLag), n, ccf — null when either side
    * of the pair set is constant). */
  def ccf(df: DataFrame, keyCol: String, orderCol: String,
      xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val lagged = (1 to maxLag).foldLeft(
        df.select(col(keyCol), col(orderCol), col(xCol), col(yCol))) {
      (acc, l) => acc.withColumn(s"__lag_$l", lag(col(xCol), l).over(w))
    }
    val pairs = lagged.select(col(keyCol),
        inline(array((0 to maxLag).map { l =>
          val xAtLag = if (l == 0) col(xCol) else col(s"__lag_$l")
          struct(lit(l).as("lag"), xAtLag.as("x"), col(yCol).as("y"))
        }: _*)))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val agg = pairs.groupBy(col(keyCol), col("lag")).agg(
      count(lit(1)).as("n"),
      sum(d(col("x"))).as("sx"), sum(d(col("y"))).as("sy"),
      sum(d(col("x")) * d(col("y"))).as("sxy"),
      sum(d(col("x")) * d(col("x"))).as("sxx"),
      sum(d(col("y")) * d(col("y"))).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    agg.select(col(keyCol), col("lag"), col("n"),
      when(varX > 0.0 && varY > 0.0,
        (n * sxy - sx * sy) / (sqrt(varX) * sqrt(varY))).as("ccf"))
  }
}
