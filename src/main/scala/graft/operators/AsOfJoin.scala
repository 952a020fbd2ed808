package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row is matched to the latest
  * right row with the same key and right.ts <= left.ts — the canonical
  * event-to-dimension-state join for training-data and feature pipelines.
  *
  * Spark-first formulation (no custom SparkPlan needed): tag and union
  * both sides, then one window pass per key ordered by (ts, side) carries
  * the most recent right payload forward onto left rows
  * (`last_value(..., ignoreNulls)` over unbounded-preceding). Cost is a
  * single sort-shuffle of |left| + |right| — the same lower bound a
  * native as-of merge join pays — and it inherits AQE/skew handling.
  * Right rows at exactly left.ts match (<=).
  *
  * PRECONDITION: the right side must be unique per (key, ts). With
  * duplicate right timestamps for a key, which payload wins is
  * undefined (the window order has no further tiebreak) — dedup the
  * state stream first (e.g. DuplicatedRowCleaner) if it can happen.
  */
object AsOfJoin {

  /** leftTs/rightTs must be the same type; payload columns are the right
    * side's non-key, non-ts columns, which appear (possibly null — no
    * match yet) on the output. */
  def asof(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == keyCol || c == rightTsCol)
    val lTagged = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal ts (<=)
      .select(Seq(col(keyCol), col("__ts"), col("__side")) ++
        left.columns.filterNot(_ == keyCol).map(c => col(c).as(s"__l_$c")) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rTagged = right
      .withColumn("__ts", col(rightTsCol))
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col("__ts"), col("__side")) ++
        left.columns.filterNot(_ == keyCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        payloadCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(col("*") +: payloadCols.map(c =>
        last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__c_$c")): _*)
    carried.filter(col("__side") === 1)
      .select(
        (col(keyCol) +:
          left.columns.filterNot(_ == keyCol).map(c => col(s"__l_$c").as(c))) ++
          payloadCols.map(c => col(s"__c_$c").as(c)): _*)
  }
}
