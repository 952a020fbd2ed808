package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** Cohort retention — group entities by the period of their FIRST
  * activity and count how many came back n periods later (the
  * "week-0 cohort, week-n retention" triangle).
  *
  * Periods are integer indices: floor(epoch_us / period_us) — pure
  * integer division, engine-exact, no calendar arithmetic (a period is
  * exactly `periodDays` days of microseconds from the epoch, not a
  * calendar week; at 100 TB the index is computed in the scan stage).
  *
  * Shape at scale: one entity-keyed aggregation for distinct
  * (entity, period) activity, a min-over for the cohort (reusing the
  * same entity partitioning), then one (cohort, offset) count — output
  * is |cohorts| x |offsets|, never entity-sized.
  */
object Retention {

  val MicrosPerDay = 86400000000L

  /** Exact period width in microseconds — exposed so oracle SQL can
    * reference the same constant the operator divides by. */
  def periodUs(periodDays: Int): Long = MicrosPerDay * periodDays

  /** (cohort_period, period_offset, n_active): entities from cohort c
    * active in period c + offset. Offset 0 rows equal the cohort sizes
    * by construction. */
  def cohorts(events: DataFrame, entityCol: String, tsCol: String,
      periodDays: Int, scope: CacheScope = CacheScope.session): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val pUs = periodUs(periodDays)
    // FLOOR division (pmod's remainder is always non-negative, so the
    // subtraction lands on an exact multiple and DIV is exact): a
    // pre-epoch timestamp indexes to a negative period instead of
    // truncating toward zero — Spark DIV alone would collapse
    // (-period, period) into index 0 and disagree with DuckDB's //
    val activity = scope.retain(events
      .select(col(entityCol).as("__e"), unix_micros(col(tsCol)).as("__us"))
      .select(col("__e"),
        expr(s"(__us - pmod(__us, $pUs)) DIV $pUs").as("period"))
      .distinct())
    val cohort = activity.groupBy(col("__e"))
      .agg(min(col("period")).as("cohort_period"))
    activity.join(cohort, Seq("__e"))
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
