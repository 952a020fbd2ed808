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
