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
  * duration plus one sort of the |distinct durations| table; the
  * ordered window runs on the aggregate (bounded by distinct event
  * times, never cohort size), so the plan survives a 100× cohort where
  * the O(users × times) cross join does not. The KM survival curve
  * itself is the sequential product Π(1 - d/n_at_risk), computed
  * client-side from this table as is standard.
  */
object Survival {

  /** Risk table: for each distinct duration with at least one event,
    * `t`, `n_at_risk` (duration >= t), `d` (events at t) and
    * `censored_at_t`. `eventCol` must be 0/1. */
  def riskTable(labels: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val perTime = labels.groupBy(col(durationCol).as("t")).agg(
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
