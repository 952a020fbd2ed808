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

  /** Join-key skew diagnostic — the number read BEFORE choosing between
    * a plain shuffle join, AQE skew splitting, and explicit salting:
    * the top `topN` keys with their row counts and share of the table,
    * plus the global context (total rows, distinct keys) on every row.
    * One aggregation + a bounded top-N; the per-key table never
    * collects. A top-1 share near 1/parallelism means one reducer owns
    * that key's whole payload and salting (or AQE skew join) is
    * mandatory. */
  def keySkewReport(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val perKey = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = perKey.agg(
      sum(col("cnt")).cast("long").as("total_rows"),
      count(lit(1)).as("n_keys"))
    // surrogate long id for the bounded top-k aggregator: integral keys
    // ride as themselves (tiebreak = key ASC — replayable by any SQL
    // engine); other types get an xxhash64 surrogate (tiebreak then
    // engine-specific — fine for the diagnostic, noted for oracles).
    // Originals re-join by surrogate for the topN survivors only.
    val integral = df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val keyed = perKey.withColumn("__kid",
      if (integral) col(keyCol).cast("long") else xxhash64(col(keyCol)))
    val top = TopKAggregator.topKPerGroup(
      keyed.withColumn("__g", lit(1))
        .select(col("__g"), col("__kid"), col("cnt").cast("double").as("__s")),
      Seq("__g"), "__kid", "__s", topN)
    top
      .join(keyed.select(col("__kid"), col(keyCol)), Seq("__kid"))
      .crossJoin(broadcast(totals))
      .select(col("rank"), col(keyCol), col("__s").cast("long").as("cnt"),
        (col("__s") / col("total_rows").cast("double")).as("share"),
        col("total_rows"), col("n_keys"))
  }

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

  /** Skew-safe equi-join: the FACT side's hot keys are spread across
    * `buckets` salted partitions (salt derived deterministically from
    * `saltSeed`, e.g. a row id — never rand(), which breaks retries and
    * reproducibility), and the DIM side is replicated once per bucket via
    * one `explode` of a literal range. Semantically identical to
    * `fact.join(dim, keys, joinType)` — the oracle-checkable property —
    * with the shuffle key widened to (keys, salt) so no reducer receives
    * more than ~1/buckets of any hot key.
    *
    * This is the manual fallback for the cases AQE skew-join splitting
    * does not cover (non-sort-merge plans, stateful downstream stages,
    * deterministic layout requirements); replication multiplies the DIM
    * side by `buckets`, so keep it for genuinely small-to-medium dims.
    * `joinType` supports inner/left: right/full would need the UNSALTED
    * dim row to survive when no fact row matches, which replication
    * breaks by design. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltSeed: Column, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(Seq("inner", "left", "left_outer", "leftouter")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, got $joinType")
    // int salt on both sides (sequence() yields array<int>; a long salt
    // would force a join-key cast); a null seed falls back to bucket 0 —
    // a null __salt would match NO replicated dim row and silently break
    // the plain-join equivalence for nullable seed columns
    val saltedFact = fact.withColumn("__salt",
      coalesce(salt(saltSeed, buckets), lit(0)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
