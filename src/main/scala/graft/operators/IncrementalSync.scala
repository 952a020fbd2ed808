package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental sync — the reference's flagship composite
  * (sync_db_2_db, fastetl/custom_functions/fast_etl.py:454-652).
  *
  * Reference plan: high-watermark filter at the source -> staging table ->
  * UPDATE-join + INSERT-NOT-EXISTS merge inside the destination DB ->
  * optional DELETE of keys from an exclusion registry.
  *
  * Spark restatement: the merge is a left-anti join (keep destination rows
  * not replaced) unioned with the increment — one shuffle on the key, no
  * staging table, no per-row statements. At 100 TB the destination side is
  * the big relation; the increment is typically small enough that AQE
  * converts the anti-join to a broadcast join automatically.
  *
  * Edge cases preserved from the reference:
  *  - empty destination is an error (fast_etl.py:551-555)
  *  - watermark predicate is strictly `>` (fast_etl.py:422-425): rows whose
  *    timestamp equals the watermark are NOT re-pulled (documented
  *    reference behavior, kept bug-for-bug)
  */
object IncrementalSync {

  /** Destination high-watermark: max(dateColumn) (fast_etl.py:405-413). */
  def watermark(dest: DataFrame, dateColumn: String): Any = {
    val row = dest.agg(max(col(dateColumn))).head()
    require(!row.isNullAt(0),
      "Destination table is empty — full load required before incremental " +
      "sync (reference contract, fast_etl.py:554-555)")
    row.get(0)
  }

  /** Source rows past the watermark (P5). The filter is a plain Column
    * predicate so it pushes down to the scan (parquet stats / JDBC WHERE
    * clause).
    *
    * `inclusive = false` (default) is the reference's strict `>`
    * (fast_etl.py:422-425): rows stamped exactly at the watermark are
    * missed — kept bug-for-bug. `inclusive = true` is the documented fix
    * (`>=`): at-watermark rows are re-pulled and the merge makes the
    * re-application idempotent. */
  def increment(source: DataFrame, dateColumn: String, wm: Any,
      inclusive: Boolean = false): DataFrame =
    if (inclusive) source.filter(col(dateColumn) >= lit(wm))
    else source.filter(col(dateColumn) > lit(wm))

  /** Merge an increment into the destination: update matched keys, insert
    * new ones (reference J1+J2, fast_etl.py:437-450) in one pass.
    * If the increment carries duplicate keys, the destination row is still
    * replaced exactly by those rows (same as the reference, whose UPDATE
    * applies an arbitrary one and INSERT appends none). */
  def mergeBatch(dest: DataFrame, inc: DataFrame, keys: Seq[String]): DataFrame =
    dest.join(inc, keys, "left_anti").unionByName(inc)

  /** Exclusion sync (reference J3/K15, fast_etl.py:612-633): drop rows
    * whose key appears in the exclusion registry past the watermark. */
  def applyExclusions(
      dest: DataFrame,
      exclusions: DataFrame,
      keys: Seq[String],
      exclusionFilter: Column = lit(true)): DataFrame =
    dest.join(
      exclusions.filter(exclusionFilter).select(keys.map(col): _*).distinct(),
      keys, "left_anti")

  /** Whole composite over DataFrames: watermark -> increment -> merge ->
    * exclusions. `sinceOverride` mirrors the reference's `since_datetime`
    * param (fast_etl.py:557-559). */
  def sync(
      source: DataFrame,
      dest: DataFrame,
      keys: Seq[String],
      dateColumn: String,
      exclusions: Option[DataFrame] = None,
      sinceOverride: Option[Any] = None): DataFrame = {
    val wm = sinceOverride.getOrElse(watermark(dest, dateColumn))
    val inc = increment(source, dateColumn, wm)
    val merged = mergeBatch(dest, inc, keys)
    exclusions.fold(merged)(ex => applyExclusions(merged, ex, keys))
  }
}
