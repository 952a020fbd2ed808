package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union ("merge overlapping spans"): collapse per-key interval
  * rows into maximal disjoint spans — coverage windows from shipment
  * legs, validity ranges, sensor on-periods. The classic gaps-and-islands
  * reshaping every warehouse pipeline eventually needs.
  *
  * Plan shape (the scale story): one sort-shuffle per key computes BOTH
  * window passes (running max-end over the preceding frame to detect
  * gaps, running sum of gap flags to number islands — same partition +
  * order, Spark plans a single Sort + Window pair over one Exchange),
  * then a partial-aggregated groupBy(key, island) reduces each island to
  * its span. Island rows are a small fraction of input, so the second
  * exchange moves only combiner output. Nothing is driver-side; per-key
  * data never has to fit in memory beyond the window sort's spillable
  * run.
  *
  * Overlap rule: a row whose start <= the running max end of its
  * predecessors (same key, (start, end) order) extends the current span;
  * touching intervals merge. Island numbering is deterministic even with
  * (start, end) ties: a tied row can never open a new island (its start
  * equals a seen start <= running max end), so every tie-permutation
  * assigns identical island ids.
  */
object Intervals {

  /** @param keyCol   partition key (spans are merged per key)
    * @param startCol inclusive span start (any ordered type)
    * @param endCol   inclusive span end; rows with end < start are
    *                 treated as [start, start] (degenerate but merged
    *                 consistently on both engines via greatest()).
    * Output: keyCol, island (1-based per key), span_start, span_end,
    * n_rows (source rows merged into the span).
    */
  def merge(df: DataFrame, keyCol: String, startCol: String,
            endCol: String): DataFrame = {
    // Clamp once in the input projection so both windows order by plain
    // attributes — a derived sort key would re-materialize per window and
    // cost a second Sort over the same exchange.
    val ord = Seq(col(startCol), col(endCol))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), col(startCol),
        greatest(col(endCol), col(startCol)).as(endCol))
      .withColumn("__prev_max", max(col(endCol)).over(wPrev))
      .withColumn("__new_island",
        when(col("__prev_max").isNull || col(startCol) > col("__prev_max"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("__new_island")).over(wRun))
      .groupBy(col(keyCol), col("island"))
      .agg(
        min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_rows"))
  }

  /** Peak overlap per key: the maximum number of intervals simultaneously
    * active (inclusive ends) — capacity/occupancy analysis over the same
    * interval model. Sweep line as a window: +1 at start, -1 at end,
    * running sum ordered by (ts, delta DESC) so starts at a timestamp are
    * counted before ends at the same timestamp (inclusive semantics).
    * The peak is order-invariant among equal (ts, delta) rows — the
    * running sum reaches the same value after the tied block either way —
    * so the result is deterministic without a unique tiebreak. One
    * sort-shuffle on key, then a combiner-reduced max per key. */
  def maxConcurrency(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val clamped = df.select(col(keyCol), col(startCol),
      greatest(col(endCol), col(startCol)).as(endCol))
    val deltas = clamped
      .select(col(keyCol), col(startCol).as("ts"), lit(1L).as("delta"))
      .unionAll(clamped
        .select(col(keyCol), col(endCol).as("ts"), lit(-1L).as("delta")))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("ts"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("__running", sum(col("delta")).over(w))
      .groupBy(col(keyCol))
      .agg(max(col("__running")).as("max_concurrent"))
  }
}
