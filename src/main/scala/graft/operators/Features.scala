package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tabular feature engineering for model training — the last-mile
  * transforms between a curated corpus and a training matrix.
  */
object Features {

  /** Hashing-trick text featurization: tokens hash into `dims` buckets
    * with a ±1 sign bit (Weinberger et al.'s signed feature hashing —
    * the sign makes collision noise zero-mean), giving a fixed-width
    * sparse representation with NO vocabulary state: no dictionary to
    * build, broadcast, or keep consistent across training shards — the
    * property that makes this the featurizer that survives streaming
    * ingest and 100 TB corpora unchanged. Engine-portable: bucket =
    * first-6-md5-hex fold of the token mod dims (Sampling.hashBucket's
    * idiom), sign = parity of the 7th hex char. Output: one row per
    * (id, non-empty bucket) with the signed count sum — zero-sum
    * buckets from exact ± cancellation are kept (they are observations,
    * not absences). */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame = {
    require(dims >= 1, s"need dims >= 1, got $dims")
    val terms = df.select(col(idCol),
        explode(split(graft.functions.TextFunctions.normalize(col(textCol)),
          " ")).as("__term"))
      .filter(col("__term") =!= "")
    val bucket = Sampling.hashBucket(col("__term"), dims)
    val sign = when(
      conv(substring(md5(col("__term")), 7, 1), 16, 10).cast("long") % 2
        === 0, lit(1L)).otherwise(lit(-1L))
    terms
      .select(col(idCol), bucket.as("bucket"), sign.as("__s"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__s")).as("weight"))
  }

  /** Lag-feature matrix: `lag_1..lag_k` of `valueCol` per key in
    * (ts, tie) order — the autoregressive feature block, k columns from
    * ONE per-key sort-shuffle (every lag shares the window). Leading
    * rows hold nulls (no fabricated history). */
  def lagMatrix(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    (1 to k).foldLeft(df) { (d, j) =>
      d.withColumn(s"lag_$j", lag(col(valueCol), j).over(w))
    }
  }

  /** Leave-one-out target encoding: each row's category feature is the
    * mean target of its category EXCLUDING the row itself —
    * `(S_cat - x) / (n_cat - 1)` — the standard guard against the
    * self-leakage that plain mean encoding injects (a rare category
    * would otherwise memorize its own label). Engine-exact: S is a
    * decimal partial sum, the subtraction is decimal, and the single
    * closing division is one correctly-rounded double op
    * (the Stats contract). Categories with one row (or a null target)
    * encode null; callers fill with a prior downstream. */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
      outCol: String = "te_loo"): DataFrame = {
    val d = col(targetCol).cast("decimal(18,2)")
    val stats = df
      .filter(col(catCol).isNotNull && col(targetCol).isNotNull)
      .groupBy(col(catCol))
      .agg(sum(d).as("__s"), count(lit(1)).as("__n"))
    df.join(broadcast(stats), Seq(catCol), "left")
      .withColumn(outCol,
        when(col(targetCol).isNotNull && col("__n") > 1,
          (col("__s") - d).cast("double") /
            (col("__n") - 1).cast("double")))
      .drop("__s", "__n")
  }

  /** Quantile normalization across sources: each row's value is
    * replaced by the POOLED distribution's value at the row's
    * within-source quantile — the batch-effect correction that makes
    * quality/perplexity scores from different scorers or corpus shards
    * comparable before mixing (the microarray normalization classic,
    * Bolstad et al. 2003, generalized to unequal source sizes via a
    * q-point grid).
    *
    * ENGINE-EXACT, integer end to end: the row's grid position is
    * p = ⌈rank_s · q / n_s⌉ (per-source rank, deterministic `tieCol`
    * order); grid point p holds the pooled value at global rank
    * ⌈p · N / q⌉, derived WITHOUT a global row sort: one (value, count)
    * aggregate, a cumulative-count window over the |distinct values|
    * table, then each distinct value EMITS its covered grid positions
    * p ∈ (cum_prev·q/N, cum·q/N] via an integer `sequence` — exactly q
    * grid rows total, broadcast back onto the rows. No doubles anywhere;
    * the output is a VALUE the pooled distribution actually contains.
    *
    * SCALE CONTRACT (the Survival.riskTable shape): the only global
    * window runs over the DISTINCT-VALUE aggregate — small for discrete
    * or pre-bucketed values; bucket continuous values upstream (or feed
    * scores in micro units) exactly as `durationBucket` prescribes.
    * Per-source rank windows partition by source. Output: input
    * columns + `qn_pos` (grid position) + `qn` (normalized value). */
  def quantileNormalize(df: DataFrame, sourceCol: String, valueCol: String,
      tieCol: String, q: Int): DataFrame = {
    require(q >= 1, s"need q >= 1, got $q")
    val rows = df.filter(col(valueCol).isNotNull && col(sourceCol).isNotNull)
    val wS = Window.partitionBy(col(sourceCol))
      .orderBy(col(valueCol), col(tieCol))
    val wN = Window.partitionBy(col(sourceCol))
    // pooled grid: value at global rank ceil(p*N/q) for p = 1..q
    val dv = rows.groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = dv
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
    // positions covered by this value: p in (prev*q/N, cum*q/N]
    val grid = cum
      .withColumn("__plo",
        expr(s"CAST(((__cum - __c) * $q) div __n AS INT) + 1"))
      .withColumn("__phi", expr(s"CAST((__cum * $q) div __n AS INT)"))
      .filter(col("__phi") >= col("__plo"))
      .select(explode(sequence(col("__plo"), col("__phi"))).as("qn_pos"),
        col("__v").as("qn"))
    rows
      .withColumn("__rn", row_number().over(wS).cast("long"))
      .withColumn("__ns", count(lit(1)).over(wN))
      .withColumn("qn_pos",
        expr(s"CAST((__rn * $q + __ns - 1) div __ns AS INT)"))
      .join(broadcast(grid), Seq("qn_pos"))
      .drop("__rn", "__ns")
  }
}
