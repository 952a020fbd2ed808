package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row is matched to the latest
  * right row with the same key and right.ts <= left.ts — the canonical
  * event-to-dimension-state join for training-data and feature pipelines.
  *
  * Spark-first formulation (no custom SparkPlan needed): tag and union
  * both sides, then one window pass per key ordered by (ts, side)
  * carries the most recent right row forward onto left rows. The carry
  * is ONE struct of (ts, payload...) — never per-column: the match is
  * atomically the nearest right ROW, so a null payload value in that row
  * comes through as null (exactly DuckDB ASOF semantics) instead of
  * falling back to some older row's value, and multi-column payloads can
  * never mix values from different rows. Cost is a single sort-shuffle
  * of |left| + |right| — the same lower bound a native as-of merge join
  * pays — and it inherits AQE/skew handling. Right rows at exactly
  * left.ts match (<=).
  *
  * `asofDirectional` generalizes the same single-sort plan to the
  * FORWARD direction (earliest right with right.ts >= left.ts — the
  * "next state change" / label-lookahead join) and to a match-window
  * TOLERANCE (a match further than `toleranceMicros` from the probe is
  * discarded, payload null — the guard that keeps a feature join from
  * silently using month-stale state at 100 TB, where out-of-SLA history
  * is a data bug, not a match).
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
      keyCol: String, leftTsCol: String, rightTsCol: String): DataFrame =
    asofDirectional(left, right, keyCol, leftTsCol, rightTsCol,
      forward = false, toleranceMicros = None)

  /** Directional, tolerance-bounded as-of.
    *
    *  - backward (forward=false): latest right with right.ts <= left.ts;
    *  - forward  (forward=true):  earliest right with right.ts >= left.ts.
    *
    * `toleranceMicros` (TimestampType ts columns only) discards matches
    * whose row timestamp is beyond the bound: the payload columns come
    * out null exactly as if no right row existed. The plan is the same
    * single union + window sort-shuffle as `asof` — direction only
    * flips the frame (preceding `last` vs following `first`), tolerance
    * is a map-side conditional after the carry.
    */
  def asofDirectional(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      forward: Boolean, toleranceMicros: Option[Long] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == keyCol || c == rightTsCol)
    // At equal ts the left row must see the right row inside its frame:
    // backward frame is (unboundedPreceding, current] so left sorts AFTER
    // right; forward frame is [current, unboundedFollowing) so left sorts
    // BEFORE right.
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    // The whole matched row travels as one struct: ts + payloads. A right
    // row's struct is never null (its ts field isn't), so first/last with
    // ignoreNulls lands on the NEAREST row even when its payload values
    // are null.
    val packType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("ts", right.schema(rightTsCol).dataType) +:
        payloadCols.map(c => org.apache.spark.sql.types.StructField(
          c, right.schema(c).dataType)))
    val lTagged = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(leftSide))
      .select(Seq(col(keyCol), col("__ts"), col("__side"),
        lit(null).cast(packType).as("__r_pack")) ++
        left.columns.filterNot(_ == keyCol).map(c => col(c).as(s"__l_$c")): _*)
    val rTagged = right
      .withColumn("__ts", col(rightTsCol))
      .withColumn("__side", lit(rightSide))
      .select(Seq(col(keyCol), col("__ts"), col("__side"),
        struct(col(rightTsCol).as("ts") +:
          payloadCols.map(c => col(c)): _*).as("__r_pack")) ++
        left.columns.filterNot(_ == keyCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val w0 = Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col("__side"))
    val w =
      if (forward) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(c: Column): Column =
      if (forward) first(c, ignoreNulls = true).over(w)
      else last(c, ignoreNulls = true).over(w)
    val carried = lTagged.unionByName(rTagged)
      .select(col("*"), pick(col("__r_pack")).as("__c"))
    val inTolerance: Column = toleranceMicros match {
      case None => col("__c").isNotNull
      case Some(tol) =>
        val gap =
          if (forward) unix_micros(col("__c.ts")) - unix_micros(col("__ts"))
          else unix_micros(col("__ts")) - unix_micros(col("__c.ts"))
        col("__c").isNotNull && gap <= lit(tol)
    }
    carried.filter(col("__side") === leftSide)
      .select(
        (col(keyCol) +:
          left.columns.filterNot(_ == keyCol).map(c => col(s"__l_$c").as(c))) ++
          payloadCols.map(c =>
            when(inTolerance, col(s"__c.$c")).as(c)): _*)
  }
}
