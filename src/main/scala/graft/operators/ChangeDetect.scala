package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM drift detection per key: the running sum of deviations from the
  * key's mean, `S_i = Σ_{j≤i} (x_j - μ)`, flagged where |S_i| exceeds a
  * threshold — the classic screen for level shifts in a metric stream
  * (and for training-data drift across ingestion batches).
  *
  * Exactness: μ is a decimal-division away from reproducible, so it is
  * never computed. Values are first fixed to integer CENTS
  * (`decimal(18,2) × 100 → long` — exact), then
  * `n·S_i = n·R_i - i·T` (R_i = running cents sum, T = key cents total,
  * i = row rank) is pure 64-bit integer arithmetic — order-independent
  * inputs, deterministic rank, no decimal precision-cap rounding (a
  * `long × decimal(28,2)` product would exceed Spark's 38-digit cap and
  * silently lose scale). The emitted
  * `cusum = CAST(n·S_i AS DOUBLE) / (n × 100)` is one correctly-rounded
  * division — any engine replaying the same shape agrees bit-for-bit.
  * Domain bound: |n·R| must fit a long — metric streams with per-key
  * row counts ≤ ~1e6 and cent totals ≤ ~1e12 are far inside it.
  *
  * Cost: one per-key sort-shuffle (rank + running sum share the window
  * sort); the per-key totals ride a broadcast-shaped aggregate joined
  * back on the key.
  */
object ChangeDetect {

  /** Adds (cusum, is_change) per non-null-value row. `threshold` is in
    * value units (|S_i| > threshold flags). */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, threshold: Double): DataFrame = {
    val cents = (col(valueCol).cast("decimal(18,2)") * lit(100)).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(cents).as("__tot"), count(lit(1)).as("__n"))
    val nS = col("__n") * sum(cents).over(run) -
      row_number().over(w).cast("long") * col("__tot")
    df.filter(col(valueCol).isNotNull)
      .join(totals, keyCol)
      .withColumn("cusum",
        nS.cast("double") / (col("__n").cast("double") * lit(100.0)))
      .withColumn("is_change", abs(col("cusum")) > threshold)
      .drop("__tot", "__n")
  }

  /** Page-Hinkley upward-shift detection per key (Page 1954; the
    * streaming-drift form surveyed in Gama et al. 2014): each
    * observation's deviation from the RUNNING mean accumulates,
    *
    *   mh_i = Σ_{j≤i} (x_j − mean_j − δ),  ph_i = mh_i − min_{j≤i} mh_j,
    *
    * alarm where ph_i > λ — the self-centering companion to [[cusum]]
    * (which deviates from the key's FIXED whole-series mean): PH needs
    * no second pass over the key, reacts to shifts against the
    * pre-shift history only, and is the standard drift trigger for
    * "did this metric step up mid-stream".
    *
    * Exactness: cents quantization first, then each rational deviation
    * (i·x_i − R_i)/i quantizes to micro value units through the exact
    * remainder-subtract integral division — TOWARD-ZERO rounding,
    * which both Spark (`%` follows the dividend) and DuckDB (`//`
    * truncates) implement identically — so mh/ph are exact integer
    * micro sums and the readout is engine-portable bit for bit. The
    * i·x_i product rides DECIMAL(38,0) (a long would wrap past
    * ~10^18.5 cent-rows).
    *
    * Cost: ONE per-key sort-shuffle — the rank, running cents sum,
    * running mh sum, and running min all share the same window sort;
    * there is no totals join (unlike cusum, PH is strictly prefix-
    * computable). δ and λ arrive in value units. */
  def pageHinkley(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, delta: Double,
      lambda: Double): DataFrame = {
    val deltaMicro = math.round(delta * 1e6)
    val lambdaMicro = math.round(lambda * 1e6)
    val i38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cents = (col(valueCol).cast("decimal(18,2)") * lit(100)).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rn = row_number().over(w).cast("long")
    // (i·x_i − R_i)/i cents → ×1e4 → micro value units, toward zero
    val num = (i38(rn) * cents - i38(sum(cents).over(run))) * 10000L
    val dev = ((num - num % rn) / rn).cast("decimal(38,0)").cast("long")
    df.filter(col(valueCol).isNotNull)
      .withColumn("__inc", dev - lit(deltaMicro))
      .withColumn("__mh", sum(col("__inc")).over(run))
      .withColumn("ph_micro", col("__mh") - min(col("__mh")).over(run))
      .withColumn("ph", col("ph_micro").cast("double") / lit(1.0e6))
      .withColumn("is_change", col("ph_micro") > lambdaMicro)
      .drop("__inc", "__mh")
  }

  /** Page-Hinkley on the DESEASONALIZED residual — the end-to-end drift
    * gate: [[Decompose.additiveMicro]] first splits the series into
    * calendar structure vs trend vs noise, then [[pageHinkley]] runs on
    * the residual alone, so a weekly rhythm (or any period-`period`
    * pattern) can NEVER fire the detector — only a genuine level step
    * against the deseasonalized history can. Raw-series PH fires on
    * every strong seasonal swing; this is the production form
    * (spec-demonstrated: rhythm-only series stays silent, an injected
    * step alarms).
    *
    * Exactness chain: cents quantization (decompose) → exact micro
    * residual → TOWARD-ZERO truncation back to cents (the rounding
    * both engines share — one derived-cent of quantization, far below
    * any useful δ) → the integer-exact PH recursion in cent units.
    * Every reported number is exact-integer-derived, so the whole
    * composite hash-matches a SQL replay.
    *
    * `delta`/`lambda` arrive in VALUE units (internally ×100 to cents).
    * Rows where the decompose window is truncated (null residual: the
    * series edges) are excluded from the PH pass — the detector sees
    * the interior only. Output: key, pos, value, resid, ph (value
    * units), is_change.
    *
    * Cost: the decompose passes plus ONE more per-key window sort over
    * the (keys × grid)-bounded residual table — callers aggregate the
    * corpus to the (key, pos) grid first, so nothing here is
    * corpus-scale. */
  def pageHinkleyDeseasonalized(df: DataFrame, keyCol: String,
      posCol: String, valueCol: String, period: Int, halfWin: Int,
      delta: Double, lambda: Double,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    val dec = Decompose.additiveMicro(df, keyCol, posCol, valueCol,
      period, halfWin, scope)
    val rm = col("resid_micro").cast("decimal(38,0)")
    val residCents = ((rm - rm % 10000L) / 10000L)
      .cast("decimal(38,0)").cast("long")
    val resid = dec.filter(col("resid_micro").isNotNull)
      .select(col(keyCol), col(posCol), col(valueCol),
        col("resid_micro"),
        residCents.cast("double").as("__rc"))
    pageHinkley(resid, keyCol, posCol, posCol, "__rc",
        delta * 100.0, lambda * 100.0)
      .select(col(keyCol), col(posCol), col(valueCol),
        (col("resid_micro").cast("double") / lit(1.0e6)).as("resid"),
        // ph_micro is micro-of-cents -> 1e-8 of a value unit
        (col("ph_micro").cast("double") / lit(1.0e8)).as("ph"),
        col("is_change"))
  }
}
