package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed aggregation — "how engaged is this entity
  * NOW", with each event's contribution fading by a constant factor per
  * day of age: score = Σ value · λ^(age_days). The recency-weighted
  * rollup behind engagement ranking, churn screens, and freshness-aware
  * source weighting in a training-data pipeline (recent crawls count for
  * more than stale ones).
  *
  * Determinism: λ^age is the one transcendental — it is rounded to
  * DECIMAL(20,12) per row BEFORE any multiplication (the house rule for
  * ln/pow parity, see q_bm25), the value column is exact at
  * DECIMAL(12,2) (product precision 33 — below the 38 cap, so no engine
  * rescales it), and the product/sum run entirely in decimal, so the
  * result is bit-identical across engines and partitionings.
  *
  * Shape at scale: one map-side pass computes each row's decayed term
  * (age is a date diff against a literal/broadcast reference date), then
  * a single entity-keyed partial-aggregating shuffle — no window, no
  * join, no corpus-sized intermediate. The convenience overload that
  * derives the reference date from the data adds one column-pruned
  * pre-pass (scan of the ts column only); production pipelines should
  * pass the run date explicitly and skip it.
  */
object DecayScore {

  /** (entity, n_events, score): decayed engagement per entity as of
    * `refDate`. Events dated AFTER refDate still count with age 0 — a
    * pipeline replaying late data should not silently drop it.
    *
    * `value` is treated as a currency-like 2-decimal quantity (sub-cent
    * digits round HALF_UP); a value that overflows DECIMAL(12,2)
    * (|v| ≥ 10^10) fails the job LOUDLY rather than silently vanishing
    * from the sum while still counting in n_events. */
  def score(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, lambda: Double, refDate: Column): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0,
      s"decay factor must be in (0, 1], got $lambda")
    val age = greatest(datediff(refDate, to_date(col(tsCol))), lit(0))
    val v = col(valueCol).cast("decimal(12,2)")
    val vChecked = when(col(valueCol).isNotNull && v.isNull,
      raise_error(concat(lit(s"DecayScore: $valueCol overflows DECIMAL(12,2): "),
        col(valueCol).cast("string")))).otherwise(v)
    val term = pow(lit(lambda), age).cast("decimal(20,12)") * vChecked
    events
      .select(col(entityCol).as("__e"), term.as("__t"))
      .groupBy(col("__e"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__t")).cast("decimal(38,14)").as("score"))
      .withColumnRenamed("__e", entityCol)
  }

  /** Reference date = the newest event date in the table, derived
    * LAZILY: the 1-row max broadcasts into a cross join (exactly the
    * oracle's `CROSS JOIN r` shape), so constructing the frame runs no
    * job and the pre-pass scan prunes to the ts column alone. Pass the
    * run date explicitly at scale to skip the pre-pass entirely. */
  def scoreFromMaxDate(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, lambda: Double): DataFrame = {
    val ref = events.select(max(to_date(col(tsCol))).as("__ref"))
    score(events.crossJoin(broadcast(ref)),
        entityCol, tsCol, valueCol, lambda, col("__ref"))
  }
}
