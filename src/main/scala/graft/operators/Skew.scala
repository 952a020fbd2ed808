package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation — the 100 TB pattern for heavy-hitter keys:
  * pre-aggregate on (key, salt) so each reducer sees at most
  * 1/`buckets` of a hot key's rows, then combine the partials.
  *
  * Spark's hash aggregate already does map-side partial aggregation, so
  * plain `groupBy` handles *sum-like* skew; explicit salting matters when
  * the partial state itself is large (collect_list, distinct sketches) or
  * when AQE's skew handling is unavailable (non-join aggregations over a
  * handful of keys). The two-phase plan is semantically identical to the
  * direct aggregation — the oracle checks exactly that.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from a row expression. */
  def salt(seed: Column, buckets: Int): Column = pmod(seed, lit(buckets))

  /** Two-phase salted sum/count: groupBy(keys :+ salt) partials, then
    * final combine on keys. `valueCol` is summed in decimal for exact,
    * order-independent results. */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String,
      saltSeed: Column, buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(saltSeed, buckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol).cast("decimal(18,2)")).as("__psum"),
        count(lit(1)).as("__pcount"))
    partial.groupBy(keys.map(col): _*)
      .agg(
        sum(col("__psum")).cast("decimal(38,2)").as(s"sum_$valueCol"),
        sum(col("__pcount")).cast("long").as("n"))
  }
}
