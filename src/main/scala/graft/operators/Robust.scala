package graft.operators

import org.apache.spark.sql.DataFrame
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
}
