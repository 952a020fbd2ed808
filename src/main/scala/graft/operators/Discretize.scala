package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equal-frequency discretization (quantile binning) — the feature-
  * engineering step that turns a skewed numeric column into k
  * evenly-populated ordinal buckets per group.
  *
  * One per-group sort-shuffle: row_number over (value NULLS LAST, tie)
  * plus the group's non-null count, then the SQL-standard ntile
  * distribution computed ARITHMETICALLY over the non-null count — with
  * `base = ⌊n/k⌋` and `rem = n mod k`, the first `rem` buckets hold
  * `base+1` rows and the rest `base` (larger buckets first, exactly
  * ntile's contract). A bare `ntile(k)` window can't be used directly:
  * it counts NULL rows in its denominator (nulls-first ordering would
  * seat them in bucket 1 and shift every boundary), whereas here nulls
  * sort last, never contaminate ranks 1..n, and get a NULL bin. Integer
  * arithmetic end to end — bin assignment is exactly reproducible on
  * any engine.
  *
  * Equal-WIDTH binning needs no sort at all (see the q_histogram
  * fixed-origin map expression); this operator is for when occupancy,
  * not width, must be uniform.
  */
object Discretize {

  /** Adds `binCol` (1..bins) to non-null rows of `valueCol`; null rows
    * keep a null bin. */
  def equalFrequency(df: DataFrame, keyCol: String, valueCol: String,
      tieCol: String, bins: Int, binCol: String = "bin"): DataFrame = {
    require(bins >= 1, s"bad bins=$bins")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(valueCol).asc_nulls_last, col(tieCol))
    val cw = Window.partitionBy(col(keyCol))
    val rn = col("__rn")
    val base = col("__base")
    val rem = col("__rem")
    val cut = rem * (base + 1) // rows seated in the rem larger buckets
    val bin = when(rn <= cut, floor((rn - 1) / (base + 1)) + 1)
      .otherwise(rem + floor((rn - cut - 1) / base) + 1)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__nn", count(col(valueCol)).over(cw))
      .withColumn("__base", floor(col("__nn") / bins))
      .withColumn("__rem", col("__nn") % bins)
      .withColumn(binCol,
        when(col(valueCol).isNotNull, bin.cast("int")))
      .drop("__rn", "__nn", "__base", "__rem")
  }

  /** Dictionary (label) encoding: every distinct non-null value of
    * `valueCol` gets a dense 1-based id in value sort order — the
    * categorical→ordinal step before training export, stable across
    * reruns and partitionings because the id is the value's RANK, not an
    * arrival order (`monotonically_increasing_id` would be partition-
    * dependent). The dictionary is the distinct-value set — aggregated
    * first (that shuffle is the only corpus-sized step), then ranked
    * with a single-partition window over the SMALL distinct table only,
    * and broadcast-joined back; null values keep a null id. For
    * unbounded-cardinality columns use hashing instead — a dictionary
    * that doesn't fit one task has no meaningful dense ids (the same
    * bounded-distinct-domain contract as [[Stats.ksStatistic]] and
    * [[Survival.riskTable]]'s `durationBucket`). */
  def labelEncode(df: DataFrame, valueCol: String,
      idCol: String = "label_id"): DataFrame = {
    val dict = df.select(col(valueCol)).filter(col(valueCol).isNotNull)
      .distinct()
      .withColumn(idCol,
        row_number().over(Window.orderBy(col(valueCol))).cast("long"))
    df.join(broadcast(dict), Seq(valueCol), "left")
  }
}
