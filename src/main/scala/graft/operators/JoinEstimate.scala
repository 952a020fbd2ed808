package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-cardinality estimation by universe (key-range) sampling — the
  * pre-flight that tells you whether an equi-join will produce 10^6 or
  * 10^10 rows BEFORE you pay for its shuffle (literature: universe /
  * correlated sampling for join size, e.g. Vengerov et al., VLDB'15
  * "Join Size Estimation Subject to Filter Conditions").
  *
  * Both sides keep exactly the keys whose md5 bucket falls under the
  * sampled range — the SAME key survives on both sides (correlated by
  * construction), so Σ aₖ·bₖ over sampled keys is an unbiased estimate
  * of the true join size once scaled by buckets/sampledBuckets. Because
  * the sample is a deterministic hash range (no RNG), the estimate is
  * reproducible on any engine/partitioning — which is also what makes
  * it oracle-checkable.
  *
  * Scale shape: two filtered partial-aggregated groupBys over the
  * sampled keys (the filter is map-side on the hash) and one join on
  * the tiny sampled-key table. The full join never runs.
  */
object JoinEstimate {

  /** One-row estimate: est_rows. `buckets` must be a multiple of
    * `sampledBuckets` so the scale-up factor is an exact integer. */
  def equiJoinRows(
      a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      buckets: Int = 10000, sampledBuckets: Int = 1000): DataFrame = {
    require(sampledBuckets > 0 && buckets % sampledBuckets == 0,
      s"buckets=$buckets must be a positive multiple of sampledBuckets=$sampledBuckets")
    val factor = (buckets / sampledBuckets).toLong
    val ca = a
      .filter(Sampling.hashBucket(col(aKey), buckets) < sampledBuckets)
      .groupBy(col(aKey).as("k")).agg(count(lit(1)).as("ca"))
    val cb = b
      .filter(Sampling.hashBucket(col(bKey), buckets) < sampledBuckets)
      .groupBy(col(bKey).as("k")).agg(count(lit(1)).as("cb"))
    ca.join(cb, "k")
      .agg((coalesce(sum(col("ca") * col("cb")), lit(0L)) * factor)
        .as("est_rows"))
  }
}
