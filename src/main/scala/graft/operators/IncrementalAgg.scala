package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation over a stored partial-state table — the
  * "incremental materialized view" pattern (reference context: nightly
  * loads re-aggregating a whole warehouse table; here each load folds
  * only its batch into per-key state).
  *
  * The state carries the MERGEABLE statistics (count, non-null count,
  * decimal sum, sum of squares, min, max): every supported final
  * (count, sum, avg, min, max, variance) decomposes over them, so
  * merging state tables is a plain per-key aggregation — the same
  * algebra Spark's own partial aggregation uses map-side, lifted to a
  * persistable artifact.
  *
  * Shape at scale: each ingest aggregates ITS batch only (map-side
  * partials collapse to |keys in batch| rows before any shuffle);
  * `merge` costs one |keys|-sized shuffle regardless of how many rows
  * the corpus has accumulated. A 100 TB history never re-aggregates —
  * state is key-cardinality-sized, and the decimal sums make the fold
  * order-independent (bit-equal whatever the batch split).
  */
object IncrementalAgg {

  /** Per-key partial state of one batch. `valueCol` is aggregated in
    * DECIMAL(18,2) (exact, order-independent); NULL values count into
    * `n_rows` but no other statistic. Sums are rendered at the CANONICAL
    * widths below so a state table, a merge of state tables, and a
    * re-merged compaction all share one parquet schema (merge would
    * otherwise widen the decimals and a later explicit-schema read of
    * mixed partitions fails). */
  def state(batch: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val v = col(valueCol).cast("decimal(18,2)")
    canonical(batch.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      count(v).as("n_vals"),
      sum(v).as("sum_v"),
      sum(v * v).as("sum_sq"),
      min(v).as("min_v"),
      max(v).as("max_v")), keys)
  }

  private def canonical(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n_rows").cast("long").as("n_rows"),
      col("n_vals").cast("long").as("n_vals"),
      col("sum_v").cast("decimal(38,2)").as("sum_v"),
      col("sum_sq").cast("decimal(38,4)").as("sum_sq"),
      col("min_v").cast("decimal(18,2)").as("min_v"),
      col("max_v").cast("decimal(18,2)").as("max_v")): _*)

  /** Fold any number of state tables into one (associative and
    * commutative — spec-pinned; a key present in one input passes
    * through unchanged). */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    canonical(states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_vals")).as("n_vals"),
        sum(col("sum_v")).as("sum_v"),
        sum(col("sum_sq")).as("sum_sq"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v")), keys)
  }

  /** Render the finals from a state table. Averages divide the exact
    * double-cast sum by the count — IEEE-exact and engine-identical
    * because both operands are (sum is decimal-exact before the cast).
    * Compared projection: decimals surface as DOUBLE, counts as
    * BIGINT. */
  def finalize(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n_rows").cast("long").as("n_rows"),
      col("n_vals").cast("long").as("n_vals"),
      col("sum_v").cast("double").as("sum_value"),
      col("min_v").cast("double").as("min_value"),
      col("max_v").cast("double").as("max_value"),
      (col("sum_v").cast("double") / col("n_vals")).as("avg_value")): _*)
}
