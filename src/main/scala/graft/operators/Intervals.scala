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

  /** Coverage subtraction A \ B per key: maximal spans covered by at
    * least one `a` interval and no `b` interval — "sessions minus
    * maintenance windows", "availability minus blackouts". HALF-OPEN
    * semantics `[start, end)`: set subtraction on a continuous domain
    * isn't representable with inclusive ends (removing [3,5] from
    * [0,10] leaves [0,3) — no inclusive right endpoint exists), so this
    * family — unlike [[merge]]'s inclusive convention — treats `end` as
    * exclusive; degenerate rows (end <= start) cover nothing and drop
    * out of the algebra naturally. Touching spans merge ([0,5)+[5,10) =
    * [0,10)); a subtrahend touching only at a boundary removes nothing.
    *
    * Plan shape: boundary deltas (+1/-1 per side) collapse with ONE
    * keyed groupBy on (key, ts) — net deltas per distinct timestamp, so
    * the sweep windows are tie-free by construction — then every window
    * pass (two running coverages, lead, lag-flag, island numbering)
    * shares the single (key, ts) sort; the closing island aggregate is
    * combiner-reduced. No join, no cross product, two keyed exchanges.
    *
    * Output: (keyCol, island (1-based per key), span_start, span_end). */
  def subtract(a: DataFrame, b: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame =
    coverageIslands(a, b, keyCol, startCol, endCol,
      (covA, covB) => covA > 0 && covB === 0)

  /** Coverage intersection A ∩ B per key: maximal spans covered by at
    * least one interval of EACH side — same half-open sweep as
    * [[subtract]]. */
  def intersect(a: DataFrame, b: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame =
    coverageIslands(a, b, keyCol, startCol, endCol,
      (covA, covB) => covA > 0 && covB > 0)

  private def coverageIslands(a: DataFrame, b: DataFrame, keyCol: String,
      startCol: String, endCol: String,
      active: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): DataFrame = {
    def deltas(df: DataFrame, dA: Long, dB: Long) =
      df.select(col(keyCol), col(startCol).as("__ts"),
          lit(dA).as("__da"), lit(dB).as("__db"))
        .unionAll(df.select(col(keyCol), col(endCol).as("__ts"),
          lit(-dA).as("__da"), lit(-dB).as("__db")))
    val collapsed = deltas(a, 1L, 0L).unionAll(deltas(b, 0L, 1L))
      .groupBy(col(keyCol), col("__ts"))
      .agg(sum(col("__da")).as("__da"), sum(col("__db")).as("__db"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("__ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy(col(keyCol)).orderBy(col("__ts"))
    collapsed
      .withColumn("__cov_a", sum(col("__da")).over(wRun))
      .withColumn("__cov_b", sum(col("__db")).over(wRun))
      .withColumn("__nxt", lead(col("__ts"), 1).over(wLead))
      // the last boundary per key always has zero coverage (every
      // interval closes), so its null __nxt never reaches the output
      .withColumn("__active", active(col("__cov_a"), col("__cov_b")))
      .withColumn("__nf",
        when(col("__active") &&
          !coalesce(lag(col("__active"), 1).over(wLead), lit(false)), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("__nf")).over(wRun))
      .filter(col("__active"))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col("__ts")).as("span_start"),
        max(col("__nxt")).as("span_end"))
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
