package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consecutive-activity streaks (gaps-and-islands): per entity, the
  * run-length structure of its active days — longest streak, number of
  * distinct streaks, total active days. The classic engagement /
  * habit-formation label next to `Retention` (cohort view) and
  * `Sessionize` (intra-day view); fastETL pipelines hand this shape to
  * SQL (fastetl/custom_functions/fast_etl.py builds the copy, the
  * warehouse runs the window) — here the window IS the engine's.
  *
  * Method: distinct (entity, day) grid, then the island id is
  * `day − row_number()` per entity (consecutive days share it — both
  * sides step by one), one groupBy per island, one per entity. Integer
  * date arithmetic end to end — nothing to drift across engines.
  *
  * Plan shape: one shuffle for the distinct, one per-entity window
  * sort, two hash aggregations; the window input is the DISTINCT-DAY
  * grid (≤ days-per-entity rows, never raw events), so a 100× event
  * corpus grows the sort only by new (entity, day) cells.
  *
  * Output: entity, longest_streak, n_streaks, active_days,
  * longest_start (first day of the earliest longest streak — ties take
  * the earliest start). */
object Streaks {

  def dailyStreaks(df: DataFrame, entityCol: String,
      tsCol: String): DataFrame = {
    val days = df
      .filter(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .select(col(entityCol), to_date(col(tsCol)).as("__d"))
      .distinct()
    val w = Window.partitionBy(col(entityCol)).orderBy(col("__d"))
    val islands = days
      .withColumn("__rn", row_number().over(w))
      .withColumn("__isl", date_sub(col("__d"), col("__rn")))
      .groupBy(col(entityCol), col("__isl"))
      .agg(count(lit(1)).as("__len"), min(col("__d")).as("__start"))
    // the per-entity max rides a window over the ISLAND table (small),
    // so "earliest start among longest streaks" is one conditional min
    val withMax = islands.withColumn("__maxlen",
      max(col("__len")).over(Window.partitionBy(col(entityCol))))
    withMax.groupBy(col(entityCol)).agg(
      max(col("__len")).as("longest_streak"),
      count(lit(1)).as("n_streaks"),
      sum(col("__len")).as("active_days"),
      min(when(col("__len") === col("__maxlen"), col("__start")))
        .as("longest_start"))
  }
}
