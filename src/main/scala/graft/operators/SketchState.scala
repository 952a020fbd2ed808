package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch state tables (HyperLogLog, Apache
  * DataSketches via Spark's `hll_sketch_agg` family) — the incremental
  * companion to `IncrementalAgg` for the one aggregate that is NOT
  * algebraic: COUNT DISTINCT.
  *
  * The 100 TB pattern: re-scanning a year of events to count monthly
  * uniques is a full-corpus pass per question; instead, persist one
  * small binary sketch per (key, period) at ingest time, then answer any
  * rollup — distinct users per week / month / arbitrary date range — by
  * unioning the relevant sketches. Union cost is proportional to the
  * STATE table (thousands of rows), not the corpus; and sketch union is
  * associative + commutative, so state built per ingestion batch merges
  * into exactly the state a full rebuild would produce.
  *
  * Exactness note: a fresh DataSketches HLL stays in exact (sparse
  * coupon) mode below ~0.75·2^lgK items, so small-cardinality estimates
  * are exact counts; past that the ±~1.04/√2^lgK relative error applies.
  * Estimates are deterministic for a given item SET (hashing is
  * seed-fixed, union is order-independent) — reruns and repartitionings
  * agree bit-for-bit; only a different engine's sketch library would
  * not, so driver oracles for sketch queries compare exact counts and
  * are registered only where the data keeps sketches in the exact
  * regime.
  */
object SketchState {

  /** Build (or rebuild for one ingest batch) the sketch state: one row
    * per key tuple with a binary `sketch` of distinct `valueCol`.
    * `lgK` trades size for error (12 → 4 KiB, ~1.6%). */
  def build(df: DataFrame, keyCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Fold a batch's state into stored state: rows for the same key merge
    * by sketch union, new keys pass through — one key-sized shuffle of
    * sketch binaries, regardless of how much raw data each represents. */
  def merge(stored: DataFrame, batch: DataFrame,
      keyCols: Seq[String]): DataFrame =
    stored.unionByName(batch)
      .groupBy(keyCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Roll the state up to a coarser grain (`groupCols` ⊆ build keys) and
    * estimate: (groupCols, n_distinct). */
  def estimate(state: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty)
        state.agg(hll_union_agg(col("sketch")).as("sketch"))
      else
        state.groupBy(groupCols.map(col): _*)
          .agg(hll_union_agg(col("sketch")).as("sketch"))
    grouped.select(groupCols.map(col) :+
      hll_sketch_estimate(col("sketch")).as("n_distinct"): _*)
  }
}
