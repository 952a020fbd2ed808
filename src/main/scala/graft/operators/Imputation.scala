package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Value-repair cleaners over group statistics: winsorization (clip to
  * exact per-group quantiles) and mode imputation (fill nulls with the
  * group's most frequent value) — the two standard column repairs a
  * feature pipeline applies before training, restated relationally.
  *
  * Both are deterministic by construction: winsorize bounds come from
  * the rank-select exact quantile (inverse CDF, explicit tiebreak —
  * Quantiles.exactQuantiles), mode ties break to the smallest value.
  * The bounds/mode tables are |keys|-sized, so the join back onto the
  * corpus is broadcast-shaped; the corpus itself is scanned twice
  * (once for the statistic, once for the repair) and shuffled at most
  * once (the quantile sort).
  */
object Imputation {

  /** Clip `valueCol` to its per-key exact [pLo, pHi] quantiles; the
    * clipped value lands in `<valueCol>_w` beside the original.
    * `tieCol` must make (valueCol, tieCol) unique per key (quantile
    * determinism under duplicate values).
    *
    * Nulls are handled explicitly on both sides of the computation:
    * they are excluded from the quantile ranks (a null is not a small
    * value — Spark's nulls-first sort would otherwise occupy rank 1 and
    * count toward n), and a null value winsorizes to null (Spark's
    * least/greatest SKIP nulls, so the naive clip would fabricate the
    * upper bound for missing data). Keys with only null values get null
    * bounds via the left join and pass through untouched. */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
                tieCol: String, pLo: Double, pHi: Double): DataFrame = {
    require(pLo > 0 && pLo < pHi && pHi <= 1, s"need 0 < pLo < pHi <= 1")
    val qs = Quantiles.exactQuantiles(
      df.filter(col(valueCol).isNotNull), valueCol, tieCol,
      Seq(keyCol), Seq(pLo, pHi))
    val bounds = qs.groupBy(col(keyCol)).agg(
      min(when(col("p") === pLo, col("q"))).as("__lo"),
      min(when(col("p") === pHi, col("q"))).as("__hi"))
    df.join(bounds, Seq(keyCol), "left")
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNotNull,
          greatest(least(col(valueCol), col("__hi")), col("__lo"))))
      .drop("__lo", "__hi")
  }

  /** Fill nulls in `valueCol` with the per-key mode of its non-null
    * values (ties to the smallest value). Keys whose values are ALL
    * null keep their nulls — there is nothing defensible to impute. */
  def imputeMode(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol)).agg(count(lit(1)).as("__c"))
    val mode = counts
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("__c").desc, col(valueCol))))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(valueCol).as("__mode"))
    df.join(mode, Seq(keyCol), "left")
      .withColumn(valueCol, coalesce(col(valueCol), col("__mode")))
      .drop("__mode")
  }
}
