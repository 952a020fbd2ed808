package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the multi-source consolidation step of a
  * master-data pipeline (reference scope: merging overlapping government
  * registries): rows for the same key arrive from several sources, and
  * the output keeps ONE row per key whose every field is the first
  * non-null value in source-priority order. Field-LEVEL, not row-level:
  * a high-priority source with a missing phone still yields a complete
  * record when a lower-priority source has it.
  *
  * One per-key sort-shuffle: `first(col, ignoreNulls)` over the
  * priority-ordered full-partition frame for every value column, then
  * the rank-1 row carries the merged result out (all the firsts are
  * partition-constant, so any row could; rank 1 keeps it deterministic).
  * Also emitted: `n_sources` (rows merged) per key.
  */
object GoldenRecord {

  def merge(df: DataFrame, keyCol: String, priorityCol: String,
      tieCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "no value columns to merge")
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(priorityCol), col(tieCol))
    val full = order
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val merged = valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, first(col(c), ignoreNulls = true).over(full))
    }
    merged
      .withColumn("__rn", row_number().over(order))
      .withColumn("n_sources",
        count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter(col("__rn") === 1)
      .select((keyCol +: valueCols :+ "n_sources").map(col): _*)
  }
}
