package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity activity anomaly detection: z-score each entity-day's
  * event count against that entity's own daily history, and surface the
  * days that deviate beyond a threshold — bot bursts, outage gaps turned
  * spikes, scraper runs. Scoring against the entity's OWN distribution
  * (not the global one) is what makes a 10-event day anomalous for a
  * 2-events/day user and normal for a 50-events/day one.
  *
  * Determinism without decimal gymnastics: daily counts are longs, so
  * mean and variance are derived from the exact integer sums
  * (N·Σn² − (Σn)² over N²) with ONE double division each, and sqrt is
  * correctly rounded by IEEE-754 — every engine computing this exact
  * expression tree gets bit-identical z. It is still rounded to
  * DECIMAL(20,12) at the boundary for belt-and-braces parity.
  *
  * Shape at scale: groupBy (entity, day) collapses the corpus to at most
  * |entities|·|days| rows (partial-aggregating shuffle), and the per-
  * entity stats come from an unbounded-frame window over that ALREADY
  * COLLAPSED table — the expensive corpus never flows through a window.
  */
object Anomaly {

  /** (entity, day, n, z) for entity-days with |z| ≥ threshold, from
    * entities with at least `minDays` active days and non-constant
    * activity (σ = 0 days can't be scored). Inactive days are absent
    * from the parquet, so the baseline is over ACTIVE days only —
    * "unusually heavy day" rather than "unusual vs an imputed zero". */
  def dailyOutliers(events: DataFrame, entityCol: String, tsCol: String,
      threshold: Double, minDays: Int): DataFrame = {
    val daily = events
      .groupBy(col(entityCol).as("__e"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
      // n^2 is projected BEFORE the window so all three frame aggregates
      // compile into ONE Window node (a sum over a derived expression
      // would otherwise split into a second window pass)
      .withColumn("__n2", col("n") * col("n"))
    val w = Window.partitionBy(col("__e"))
    val stats = daily
      .withColumn("__nd", count(lit(1)).over(w))
      .withColumn("__s", sum(col("n")).over(w))
      .withColumn("__q", sum(col("__n2")).over(w))
    val varNum = col("__nd") * col("__q") - col("__s") * col("__s")
    val mean = col("__s").cast("double") / col("__nd").cast("double")
    val sigma = sqrt(varNum.cast("double") /
      (col("__nd") * col("__nd")).cast("double"))
    stats
      .filter(col("__nd") >= minDays && varNum > 0)
      .withColumn("z",
        ((col("n").cast("double") - mean) / sigma).cast("decimal(20,12)"))
      .filter(abs(col("z")) >= threshold)
      .select(col("__e").as(entityCol), col("day"), col("n"), col("z"))
  }
}
