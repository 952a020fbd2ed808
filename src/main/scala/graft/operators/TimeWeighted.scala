package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-weighted average — the utilization/billing aggregate: a
  * value observed at t holds until the NEXT observation, so the mean
  * must weight each value by how long it held, not by how often it was
  * sampled (a sensor that reports 1 Hz while idle and 100 Hz under load
  * would otherwise drown the idle time).
  *
  * `TWA = Σ vᵢ·(tᵢ₊₁ - tᵢ) / Σ (tᵢ₊₁ - tᵢ)` over each key's
  * observations ordered by (ts, tie); the final observation has no
  * holding interval and contributes nothing. One per-key window (lead)
  * + one aggregation.
  *
  * Exactness: values fix to integer cents, intervals truncate to whole
  * SECONDS (micros div 1e6) — keeping every product and both sums in
  * exact 64-bit integers (cents·seconds up to ~9e18; second resolution
  * is the documented contract, sub-second holds round down) — and the
  * single closing division is one correctly-rounded double op. Output:
  * key, held_seconds, twa (null for keys with zero held time).
  */
object TimeWeighted {

  def average(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val cents = (col(valueCol).cast("decimal(18,2)") * lit(100)).cast("long")
    val tu = unix_micros(col(tsCol))
    val dtSec = ((lead(tu, 1).over(w) - tu) / lit(1000000L)).cast("long")
    df.filter(col(valueCol).isNotNull)
      .withColumn("__c", cents)
      .withColumn("__dt", dtSec)
      .filter(col("__dt").isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(col("__c") * col("__dt")).as("__cs"),
        sum(col("__dt")).as("held_seconds"))
      .select(col(keyCol), col("held_seconds"),
        when(col("held_seconds") > 0,
          col("__cs").cast("double") /
            (col("held_seconds").cast("double") * lit(100.0))).as("twa"))
  }
}
