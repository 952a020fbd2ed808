package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus profiling — the measurement pass that precedes every filtering
  * decision: where does the quality mass sit (histogram), and how do the
  * strata differ (per-stratum report)? Both are single aggregations whose
  * outputs are bounded by bins/strata, never corpus-sized; the metric
  * arithmetic reuses the exact expressions the filters themselves apply,
  * so a threshold read off the histogram is the threshold the filter
  * enforces. */
object CorpusReport {

  /** Histogram of a score over [lo, hi): bin i covers
    * [lo + i*w, lo + (i+1)*w), scores at or above `hi` land in the top
    * bin, below `lo` in bin 0 (clamped, so the counts always sum to the
    * corpus). NULL scores are dropped. Output: (bin, lo_edge, n) for
    * OCCUPIED bins (dense zero-filling is the caller's presentation
    * concern). The bin index is integer floor arithmetic over the same
    * double expression on every engine. */
  def scoreHistogram(df: DataFrame, scoreCol: Column, bins: Int,
      lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"hi must be > lo, got [$lo, $hi)")
    // NULL and NaN scores are dropped BEFORE clamping: Spark's
    // greatest/least skip nulls (a NULL score would clamp into bin 0)
    // and floor(NaN).cast(long) is 0 (a NaN would masquerade as a
    // bottom-bin document) — filtering first gives the documented
    // semantics on every engine
    val raw = floor((col("__score") - lit(lo)) / lit(hi - lo) * lit(bins))
    val bin = least(lit(bins - 1L), greatest(lit(0L), raw.cast("long")))
    df.select(scoreCol.cast("double").as("__score"))
      .filter(col("__score").isNotNull && !isnan(col("__score")))
      .select(bin.as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_edge",
        lit(lo) + col("bin").cast("double") * lit((hi - lo) / bins))
      .select(col("bin"), col("lo_edge"), col("n"))
  }

  /** Per-stratum percentile-rank normalization of a score — the
    * transform that makes quality scores COMPARABLE across strata with
    * incompatible scales (an English-corpus score distribution says
    * nothing about the Chinese one; their percentiles do). pct =
    * (rank - 1) / (n - 1) in [0, 1] ascending (higher score => higher
    * pct), ties share a rank (percent_rank semantics), singleton strata
    * get 0.0. Rows with NULL scores are dropped — their placement in
    * the ranking is engine-dependent (NULLS FIRST vs LAST defaults)
    * and a NULL has no percentile. The built-in percent_rank computes
    * the same integer-derived IEEE division (with the same singleton
    * 0.0 guard) in Spark and DuckDB, so pct is bit-reproducible on any
    * engine. One per-stratum sort window. */
  def percentileRank(df: DataFrame, scoreCol: Column,
      strataCols: Seq[String], outCol: String = "pct"): DataFrame = {
    val ranked = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*).orderBy(col("__score").asc)
    df.withColumn("__score", scoreCol)
      .filter(col("__score").isNotNull)
      .withColumn(outCol, percent_rank().over(ranked))
      .drop("__score")
  }

  /** Per-stratum curation report: document count, total token count, and
    * the decimal-exact mean quality score (summed in DECIMAL so the
    * aggregation order cannot perturb the mean; divided as double). The
    * mean divides by the count of SCORED documents — a NULL-text row
    * counts toward n_docs but cannot deflate the mean the filters are
    * calibrated against (NULL when the stratum has no scored rows at
    * all). One hash aggregation; output is |strata| rows. */
  def strataReport(docs: DataFrame, strataCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(strataCol),
        TextFunctions.tokenCount(col(textCol)).as("__tok"),
        TextFunctions.qualityScore(col(textCol))
          .cast("decimal(20,12)").as("__q"))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).cast("bigint").as("sum_tokens"),
        (sum(col("__q")).cast("double") / count(col("__q")).cast("double"))
          .as("avg_quality"))
}
