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

  /** Per-group INTERPOLATED quantiles (the R type-7 / SQL
    * PERCENTILE_CONT definition): value at fractional rank
    * `h = (n-1)·p + 1`, linearly interpolated between the bracketing
    * ranks — `q = v_lo·(1-f) + v_hi·f` with `f = h - ⌊h⌋` (the weighted
    * form, NOT `v_lo + f·(v_hi - v_lo)`: algebraically equal, but the
    * two round differently and DuckDB evaluates the weighted one). Same
    * single per-group sort as exactQuantiles; the bracketing rows are
    * filtered out of the ranked stream and closed with one aggregation.
    *
    * Engine-exactness: h is one multiply-add of exact doubles;
    * `h - ⌊h⌋` is a Sterbenz-exact subtraction, so the 1-based form here
    * and an engine's 0-based `(n-1)·p` form produce bit-identical
    * fractions; the closing interpolation is fixed-shape. DuckDB's
    * native quantile_cont reproduces it bit-for-bit (the q_quantile_cont
    * oracle — an independent implementation, not a replay). */
  def interpolatedQuantiles(
      df: DataFrame, valueCol: String, tieCol: String,
      groupCols: Seq[String], ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"quantile ps must be in [0, 1], got $ps")
    val gs = groupCols.map(col)
    val sortW = Window.partitionBy(gs: _*)
      .orderBy(col(valueCol), col(tieCol))
    val allW = Window.partitionBy(gs: _*)
    val h = (col("n") - 1).cast("double") * col("p") + lit(1.0)
    df.filter(col(valueCol).isNotNull)
      .select((groupCols :+ valueCol :+ tieCol).map(col): _*)
      .withColumn("rn", row_number().over(sortW).cast("long"))
      .withColumn("n", count(lit(1)).over(allW))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("h", h)
      .withColumn("lo", floor(col("h")).cast("long"))
      .withColumn("hi", ceil(col("h")).cast("long"))
      .filter(col("rn") === col("lo") || col("rn") === col("hi"))
      .groupBy(gs :+ col("p"): _*)
      .agg(
        min(when(col("rn") === col("lo"), col(valueCol))).as("__vlo"),
        min(when(col("rn") === col("hi"), col(valueCol))).as("__vhi"),
        min(col("h")).as("__h"))
      .select(gs ++ Seq(col("p"), {
        val f = col("__h") - floor(col("__h"))
        (col("__vlo") * (lit(1.0) - f) + col("__vhi") * f).as("q")
      }): _*)
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
