package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median absolute deviation (MAD).
  *
  * The z-score detector (`Anomaly`) is mean/stddev-based and melts in the
  * presence of the very outliers it hunts; the MAD estimator has a 50%
  * breakdown point. Per group: `med = median(x)`,
  * `mad = median(|x - med|)`, flag rows with `|x - med| > k * mad`
  * (k ≈ 3 under the usual 1.4826 normal-consistency folding, which the
  * caller bakes into k — no magic constants here).
  *
  * Both medians are EXACT rank-select quantiles (`Quantiles
  * .exactQuantiles`, value at rank `ceil(n/2)`, deterministic tiebreak) —
  * not interpolated — so the whole report is engine-reproducible: rank
  * select is integer, `abs(x - med)` and `k * mad` are single
  * correctly-rounded IEEE ops, and the comparison is exact. Cost: two
  * per-group sort-shuffles (one per median — the second sorts a column
  * derived from the first, so it cannot be shared) plus broadcast-shaped
  * joins of the per-group scalars back to the rows. Group cardinality
  * bounds the join sides, not the corpus.
  */
object Robust {

  /** Returns df + (med, mad, absdev, is_outlier). */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
      tieCol: String, k: Double): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
    val med = Quantiles
      .exactQuantiles(rows, valueCol, tieCol, Seq(keyCol), Seq(0.5))
      .select(col(keyCol), col("q").as("med"))
    val withMed = rows.join(med, keyCol)
      .withColumn("absdev", abs(col(valueCol) - col("med")))
    val mad = Quantiles
      .exactQuantiles(withMed, "absdev", tieCol, Seq(keyCol), Seq(0.5))
      .select(col(keyCol), col("q").as("mad"))
    withMed.join(mad, keyCol)
      .withColumn("is_outlier", col("absdev") > lit(k) * col("mad"))
  }

  /** Per-key weighted median: the smallest value v (ties broken by
    * `tieCol`) whose running weight reaches half the key's total —
    * `2·W_≤v ≥ W_total`, the lower weighted median. Weights go through
    * decimal(18,2) so both window sums are exact and the comparison is
    * engine-reproducible; rows with null/non-positive weight or null
    * value are excluded. One per-key sort-shuffle (both window frames
    * share it), then a min aggregation over the qualifying suffix.
    * Output: key, wmedian. */
  def weightedMedian(df: DataFrame, keyCol: String, valueCol: String,
      weightCol: String, tieCol: String): DataFrame = {
    val dw = col(weightCol).cast("decimal(18,2)")
    val sortW = Window.partitionBy(col(keyCol))
      .orderBy(col(valueCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.partitionBy(col(keyCol))
    df.filter(col(valueCol).isNotNull && dw > 0)
      .withColumn("__runw", sum(dw).over(sortW))
      .withColumn("__totw", sum(dw).over(allW))
      .filter(col("__runw") * 2 >= col("__totw"))
      .groupBy(col(keyCol))
      .agg(min(col(valueCol)).as("wmedian"))
  }
}
