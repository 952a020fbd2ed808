package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival-analysis deliverables over (duration, event) label pairs —
  * the Kaplan-Meier risk table (subjects at risk / events / censorings
  * per distinct event time), computed WITHOUT the labels×times cross
  * join the naive formulation implies.
  *
  * Shape: one groupBy collapses the cohort to one row per distinct
  * duration (n_total / d / censored counts), then `n_at_risk(t)` — the
  * count of subjects with `duration >= t` — falls out of a single
  * descending running count over that aggregate, because the risk set
  * is descending-cumulative by construction. Cost is one shuffle on
  * duration plus one sort of the |distinct durations| table.
  *
  * SCALE CONTRACT — the ordered window runs un-partitioned over the
  * per-time aggregate, i.e. a SINGLE task sorting |distinct durations|
  * rows. That is small only when durations are genuinely discrete
  * (days, integer buckets). For CONTINUOUS or microsecond-resolution
  * durations |distinct| ≈ |cohort| and the single task becomes the
  * bottleneck: pass `durationBucket` to bin durations upstream of the
  * groupBy (t := floor(duration / bucket) · bucket), which bounds the
  * window's input by range/bucket regardless of cohort size — the same
  * pre-binning contract as `Stats.ksStatistic` and
  * `Discretize.labelEncode`. A risk table over unbinned continuous
  * durations is also statistically degenerate (every n_at_risk step is
  * 1), so the bin is what an analyst wants anyway.
  */
object Survival {

  /** Risk table: for each distinct (optionally binned) duration with at
    * least one event, `t`, `n_at_risk` (duration >= t), `d` (events at
    * t) and `censored_at_t`. `eventCol` must be 0/1. `durationBucket`
    * bins durations to `floor(d / bucket) * bucket` first — REQUIRED at
    * scale for continuous durations (see the class contract). */
  def riskTable(labels: DataFrame, durationCol: String,
      eventCol: String, durationBucket: Option[Double] = None): DataFrame = {
    val t = durationBucket match {
      case Some(b) =>
        require(b > 0, s"durationBucket must be positive, got $b")
        floor(col(durationCol) / lit(b)) * lit(b)
      case None => col(durationCol)
    }
    val perTime = labels.groupBy(t.as("t")).agg(
      count(lit(1)).as("__n_total"),
      count_if(col(eventCol) === 1).as("d"),
      count_if(col(eventCol) === 0).as("censored_at_t"))
    // risk set = reverse running count over the per-time aggregate; the
    // global (un-partitioned) window is deliberate — its input is one
    // row per distinct duration, already reduced by the groupBy above.
    val w = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perTime
      .withColumn("n_at_risk", sum(col("__n_total")).over(w))
      .filter(col("d") > 0)
      .select(col("t"), col("n_at_risk"), col("d"), col("censored_at_t"))
  }
}
