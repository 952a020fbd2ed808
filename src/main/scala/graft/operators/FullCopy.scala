package graft.operators

import graft.core.Naming
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Full-table replication (reference: copy_db_to_db,
  * fastetl/custom_functions/fast_etl.py:189-356).
  *
  * The reference moves rows through a single worker process in 1000-row
  * chunks; here the copy is a declarative plan — Catalyst prunes the scan
  * to the destination's columns (ReadSchema on parquet, column list on
  * JDBC) and executors stream partitions straight to the sink. There is no
  * driver-side materialization at any scale.
  *
  * Semantics preserved from the reference:
  *  - destination-driven projection, case-insensitive (fast_etl.py:84-89,
  *    290-309) with an optional ignore list (get_table_cols_name.py:22-24)
  *  - truncate-then-load vs append (fast_etl.py:66,317-321)
  */
object FullCopy {

  /** Project `source` onto the destination column list, case-insensitively,
    * dropping source columns the destination doesn't have. */
  def align(
      source: DataFrame,
      destColumns: Seq[String],
      columnsToIgnore: Seq[String] = Nil): DataFrame =
    source.select(
      Naming.resolveProjection(source, destColumns, columnsToIgnore): _*)

  /** Full copy into a file sink. `truncate = true` maps the reference's
    * TRUNCATE-then-INSERT to mode Overwrite; `false` to Append.
    * `atomic = true` commits the overwrite through AtomicParquet's staged
    * rename swap — the reference's single-transaction load contract
    * (readers never observe a partial destination). */
  def copyToPath(
      source: DataFrame,
      destColumns: Seq[String],
      destPath: String,
      truncate: Boolean = true,
      columnsToIgnore: Seq[String] = Nil,
      atomic: Boolean = false): Unit = {
    val aligned = align(source, destColumns, columnsToIgnore)
    if (atomic && truncate)
      graft.core.AtomicParquet.overwrite(aligned, destPath)
    else
      aligned.write
        .mode(if (truncate) SaveMode.Overwrite else SaveMode.Append)
        .parquet(destPath)
  }
}
