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
}
