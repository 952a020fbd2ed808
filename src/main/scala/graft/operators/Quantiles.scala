package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed quantiles, exact and approximate.
  *
  * - `exactQuantiles`: rank-select — one sort-shuffle per group (the
  *   window), value at rank `ceil(p*n)` picked with a deterministic
  *   tiebreak. Exact and engine-portable (integer ranks, passthrough
  *   values, no interpolation); cost is the per-group sort, which is
  *   fine up to groups that fit a distributed sort comfortably.
  * - `approxQuantiles`: `percentile_approx` (Greenwald-Khanna style
  *   sketch) — single hash aggregation, bounded memory per group,
  *   mergeable partials; the 100 TB path when a full sort per group is
  *   the bottleneck. Accuracy knob trades memory for error.
  */
object Quantiles {

  /** Per-group exact quantiles: groupCols ++ (p, q). `q` is the value at
    * rank `ceil(p*n)` ordering by (valueCol, tieCol) — the inverse-CDF
    * definition (no interpolation), deterministic under ties. */
  def exactQuantiles(
      df: DataFrame, valueCol: String, tieCol: String,
      groupCols: Seq[String], ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantile ps must be in (0, 1], got $ps")
    val gs = groupCols.map(col)
    val sortW = Window.partitionBy(gs: _*)
      .orderBy(col(valueCol), col(tieCol))
    val allW = Window.partitionBy(gs: _*)
    df.select((groupCols :+ valueCol :+ tieCol).map(col): _*)
      .withColumn("rn", row_number().over(sortW))
      .withColumn("n", count(lit(1)).over(allW))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("rn") === ceil(col("p") * col("n")))
      .select(gs ++ Seq(col("p"), col(valueCol).as("q")): _*)
  }

  /** Per-group approximate quantiles via a mergeable sketch: one
    * aggregation, no sort. Returns groupCols ++ (qs ARRAY<DOUBLE>) in
    * the order of `ps`. `accuracy` is percentile_approx's knob (higher =
    * tighter error = more memory; 10000 ~ 1e-4 relative rank error). */
  def approxQuantiles(
      df: DataFrame, valueCol: String, groupCols: Seq[String],
      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(
        col(valueCol), array(ps.map(lit): _*), lit(accuracy)).as("qs"))
}
