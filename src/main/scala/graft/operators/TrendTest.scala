package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mann-Kendall monotone-trend test per key (Mann 1945, Kendall 1975;
  * the standard nonparametric "is this metric drifting?" test) — the
  * hypothesis-test companion to [[Robust.theilSenByKey]]'s slope
  * estimate: S = Σ_{i<j} sign(x_j − x_i) over the time-ordered series,
  * with the tie-corrected normal approximation
  *
  *   Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18
  *   z = (S − sign(S)) / sqrt(Var(S))          (continuity-corrected)
  *
  * Exactness: values quantize to integer cents first (ties become
  * exact), S and 18·Var(S) are pure integer sums, and z is a
  * fixed-shape double over those integers — engine-portable bit for
  * bit. The tie term runs over per-(key, value) group sizes.
  *
  * Shape: the S sum is a per-key PAIR self-join — O(n²) per key by
  * definition (every rank statistic over pairs is). The 100 TB
  * contract mirrors [[Robust.theilSenByKey]]: feed (key, pos)-grid
  * AGGREGATES (daily/hourly series, bins), never raw corpus rows — the
  * corpus-scale pass is the upstream aggregate; the pair join runs on
  * |grid|² per key. Ties in `orderCol` make sign pairs order-ambiguous;
  * orderCol must be unique per key (a time grid is). */
object TrendTest {

  /** Output: (keyCol, n, s_stat, var18 = 18·Var(S) exact, z — null
    * when n < 2 or Var(S) = 0). */
  def mannKendall(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val cents = (col(valueCol).cast("decimal(18,2)") * lit(100))
      .cast("long")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(orderCol).as("__o"), cents.as("__c"))
    val l = base.select(col(keyCol), col("__o").as("__oi"),
      col("__c").as("__ci"))
    val r = base.select(col(keyCol), col("__o").as("__oj"),
      col("__c").as("__cj"))
    val s = l.join(r, Seq(keyCol))
      .filter(col("__oi") < col("__oj"))
      .groupBy(col(keyCol))
      .agg(sum(signum(col("__cj") - col("__ci")).cast("long")).as("s_stat"),
        count(lit(1)).as("__npairs"))
    // tie term over per-(key, value) group sizes t: Σ t(t−1)(2t+5)
    val t = col("__t")
    val ties = base.groupBy(col(keyCol), col("__c"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(keyCol))
      .agg(sum(t * (t - 1L) * (lit(2L) * t + 5L)).as("__tie"),
        sum(t).as("n"))
    val nn = col("n")
    val var18 = nn * (nn - 1L) * (lit(2L) * nn + 5L) - col("__tie")
    val sD = col("s_stat").cast("double")
    val sigma = sqrt(col("var18").cast("double") / lit(18.0))
    ties.join(s, Seq(keyCol), "left")
      .select(col(keyCol), col("n"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"),
        var18.as("var18"))
      .withColumn("z",
        when(col("n") >= 2 && col("var18") > 0L,
          when(col("s_stat") > 0L, (sD - 1.0) / sigma)
            .when(col("s_stat") < 0L, (sD + 1.0) / sigma)
            .otherwise(lit(0.0))))
  }
}
