package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation.
  *
  * Training-data pipelines need samples that are REPRODUCIBLE — the same
  * rows selected on every run, every partitioning, every engine — which
  * rules out `df.sample()` (seeded per-partition RNG: the selection
  * changes when the partitioning does). Hash sampling decides per ROW:
  * keep iff bucket(md5(key)) < rate * buckets. Stateless map-side filter,
  * no shuffle, no driver state; composable with any downstream plan; the
  * md5 base makes an external engine replay the identical choice.
  *
  * Stratified form: per-stratum rates (e.g. downsample an over-represented
  * language while keeping the tail) as a literal CASE — the 100 TB corpus
  * balancing primitive.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the row key — first 6 md5 hex
    * chars (24 bits) so the int fits every engine's signed types. */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 6), 16, 10)
      .cast("long") % buckets

  /** Keep iff the key's bucket falls under `rate` (0..1]. */
  def hashSample(key: Column, rate: Double, buckets: Int = 10000): Column =
    hashBucket(key, buckets) < (rate * buckets).toLong

  /** Per-stratum rates with a default — rows keep their deterministic
    * bucket decision within their stratum. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      buckets: Int = 10000): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    // explicit floor, not cast: long-cast truncation is engine-dependent
    // (Spark truncates, others round) the moment rate*buckets is fractional
    df.withColumn("__bucket", hashBucket(col(keyCol), buckets))
      .filter(col("__bucket") < floor(rate * lit(buckets.toDouble)))
      .drop("__bucket")
  }

  /** Per-ROW keep probability — soft quality filtering: instead of a
    * hard threshold on a quality score, each row survives with
    * probability `rateCol` (clamped to [0, 1]; NULL scores drop the
    * row), so borderline documents are downweighted rather than
    * cliff-dropped — the softer curation rule public pipelines use when
    * a hard cut measurably hurts corpus diversity. The decision is the
    * same deterministic hash as [[hashSample]]: same key + same score =>
    * same verdict on every run, partitioning, and engine. Map-side
    * filter; zero shuffles. */
  def weightedSample(df: DataFrame, keyCol: String, rateCol: Column,
      buckets: Int = 10000): DataFrame =
    df.filter(hashBucket(col(keyCol), buckets) <
      floor(least(lit(1.0), greatest(lit(0.0), rateCol)) *
        lit(buckets.toDouble)))

  /** Weighted sampling WITHOUT replacement — exactly k rows per stratum
    * with inclusion probability scaling with `weightCol` (Efraimidis–
    * Spirakis A-Res): each row draws a deterministic md5 uniform
    * u ∈ (0,1) and is ranked by u^(1/w); the k largest keys win. Unlike
    * [[weightedSample]] (independent per-row coin flips → variable
    * sample size), this delivers a FIXED budget with weight-proportional
    * selection — the "pick exactly 10k docs, favor high quality"
    * curation contract.
    *
    * Determinism/portability: u folds the first 12 md5 hex chars (48
    * bits) of the id, so the draw replays on any engine; the one
    * transcendental (pow) is settled through a DECIMAL(14,12) rounding
    * waypoint (the DecayScore treatment) before ranking, so a last-ulp
    * pow difference cannot flip an ordering. Ties (same rounded key)
    * break by id. Rows with NULL or non-positive weight are excluded —
    * u^(1/w) is undefined there, matching the algorithm's w > 0 domain.
    *
    * Scale shape: one map pass to score, then the bounded top-k
    * aggregator per stratum — no global or per-stratum full sort.
    * Output: (stratum, rank, id, wor_key). */
  def worSample(df: DataFrame, idCol: String, strataCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val v = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(281474976710656.0) // 2^48
    val w = col(weightCol).cast("double")
    val key = pow(u, lit(1.0) / w).cast("decimal(14,12)").cast("double")
    val scored = df.filter(col(weightCol).isNotNull && w > 0.0)
      .select(col(strataCol), col(idCol), key.as("wor_key"))
    graft.operators.TopKAggregator.topKPerGroup(
      scored, Seq(strataCol), idCol, "wor_key", k)
  }

  /** Keep the best `frac` of every stratum by score — calibrated
    * quality selection ("top X% per language/domain"): rows are ranked
    * inside their stratum by (score DESC, id ASC — deterministic under
    * score ties) and the top `ceil(frac * n_stratum)` survive. The
    * threshold is computed in DECIMAL from the frac's decimal rendering,
    * not double (0.07 * 100 in IEEE is 7.000000000000001 and would ceil
    * to 8 — the same representation hazard stratifiedSample guards
    * against), so keep counts are exact for every frac. NULL-score rows
    * are excluded from both the count and the keep set (the same
    * contract as [[weightedSample]]). Cost is one per-stratum sort
    * window, fine wherever the stratum fits a distributed sort; when
    * even that sort is the bottleneck at 100 TB, calibrate a CUTOFF on
    * a sketch instead ([[cutoffForKeepRate]]) and filter map-side. */
  def keepTopFraction(df: DataFrame, idCol: String, scoreCol: String,
      strataCols: Seq[String], frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    // Double.toString-based: 0.07 -> decimal 0.07 exactly
    val fracDec = lit(java.math.BigDecimal.valueOf(frac))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(idCol))
    val n = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
    df.filter(col(scoreCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .filter(col("__rn") <= ceil(fracDec * col("__n")))
      .drop("__rn", "__n")
  }

  /** Per-stratum score cutoffs achieving ~`keepRate` via a mergeable
    * quantile sketch (no sort): the (1 - keepRate) percentile of the
    * score. Join the result back (broadcast — one row per stratum) and
    * filter `score >= cutoff` map-side. The approximate-scale companion
    * to [[keepTopFraction]].
    *
    * The realized keep rate is approximate on TWO axes: the sketch's
    * rank error (tightened by `accuracy`), and — independently — tie
    * mass at the cutoff: every row tying the cutoff score passes the
    * `>=` filter, so a score distribution with heavy mass at one value
    * (clamped or coarse scores) can over-keep far beyond the target,
    * and no accuracy setting fixes that. Use [[keepTopFraction]] when
    * scores are coarse and the keep count must hold. */
  def cutoffForKeepRate(df: DataFrame, scoreCol: String,
      strataCols: Seq[String], keepRate: Double,
      accuracy: Int = 10000): DataFrame = {
    require(keepRate > 0 && keepRate < 1,
      s"keepRate must be in (0, 1), got $keepRate")
    Quantiles.approxQuantiles(df, scoreCol, strataCols,
        Seq(1.0 - keepRate), accuracy)
      .select(strataCols.map(col) :+ element_at(col("qs"), 1).as("cutoff"): _*)
  }

  /** Downsample to a TARGET MIXTURE: given per-stratum weights (e.g.
    * lang -> share of the output corpus), compute the largest output
    * that honors them without upsampling — T = min over strata of
    * (n_s / w_s) — and keep each stratum at rate w_s * T / n_s via the
    * deterministic hash. Strata absent from `weights` are dropped.
    *
    * Everything is relational: stratum counts are an aggregation, the
    * limiting ratio is a one-row aggregate joined back (both tiny,
    * broadcast), and the keep decision is the same map-side hash filter
    * as [[hashSample]] — no driver-side counting, reproducible on any
    * partitioning. The corpus-mixture rebalancing primitive. */
  def rebalanceToMixture(
      df: DataFrame, keyCol: String, strataCol: String,
      weights: Map[String, Double], buckets: Int = 10000): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val wCol = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (k, w)) => when(col(strataCol) === k, lit(w)).otherwise(acc)
    }
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", wCol)
      .filter(col("__w").isNotNull)
    val limit = counts.agg(min(col("__n") / col("__w")).as("__t"))
    val rates = counts.crossJoin(broadcast(limit))
      .withColumn("__rate",
        least(lit(1.0), col("__w") * col("__t") / col("__n")))
      .select(col(strataCol), col("__rate"))
    df.join(broadcast(rates), strataCol)
      .filter(hashBucket(col(keyCol), buckets) <
        floor(col("__rate") * lit(buckets.toDouble)))
      .drop("__rate")
  }

  /** EXACT-count budget sampling: select exactly `total` rows (when the
    * corpus has them), split across strata proportionally to stratum
    * size by the largest-remainder (Hamilton) method — the "give me
    * precisely 10M documents, keeping the source mix" request that
    * rate-based sampling can only hit in expectation.
    *
    * All integer arithmetic: `quota_i = ⌊total·nᵢ/N⌋` plus one extra
    * for the `total - Σ⌊·⌋` largest remainders `(total·nᵢ) mod N`
    * (ties by stratum value) — exact, engine-replayable. Within each
    * stratum the selected rows are the quota smallest by
    * (md5(id), id) — deterministic across partitionings, one per-stratum
    * sort-shuffle. A stratum smaller than its quota keeps everything
    * (no redistribution — single pass; re-run on the shortfall if the
    * exact total is mandatory).
    *
    * Returns the selected rows. */
  def sampleBudget(df: DataFrame, idCol: String, strataCol: String,
      total: Long): DataFrame = {
    require(total >= 0, s"bad total=$total")
    val rows = df.filter(col(strataCol).isNotNull)
    val counts = rows.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"))
    val grand = counts.agg(sum(col("__n")).as("__gt"))
    val base = counts.crossJoin(broadcast(grand))
      .withColumn("__tn", lit(total) * col("__n"))
      .withColumn("__floor", expr("__tn div __gt"))
      .withColumn("__rem", col("__tn") % col("__gt"))
    val leftover = base.agg((lit(total) - sum(col("__floor"))).as("__k"))
    val remW = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(strataCol))
    val quotas = base.crossJoin(broadcast(leftover))
      .withColumn("__rr", row_number().over(remW))
      .withColumn("__quota",
        col("__floor") + when(col("__rr") <= col("__k"), 1L).otherwise(0L))
      .select(col(strataCol), col("__quota"))
    val pickW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    rows.join(broadcast(quotas), strataCol)
      .withColumn("__pick", row_number().over(pickW))
      .filter(col("__pick") <= col("__quota"))
      .drop("__quota", "__pick")
  }

  /** Temperature-scaled mixture weights per stratum (mT5/XLM-R style,
    * arXiv:1910.10683 §3.4.1, arXiv:1911.02116 §3): sampling probability
    * p_i ∝ n_i^(1/T). T=1 reproduces the empirical distribution; T→∞
    * approaches uniform; intermediate T up-weights low-resource strata
    * without letting them dominate.
    *
    * One partial-agg shuffle on the stratum key, one broadcast of the
    * (stratum-count-sized) totals — nothing touches the corpus twice.
    *
    * Exactness: each n^(1/T) is rounded to DECIMAL(20,12) before the
    * normalizing sum, so the denominator is order-independent (the PMI
    * ln treatment). T=2 computes via `sqrt` (IEEE-exact, so the whole
    * column replays bit-identically in any engine — q_temperature_mix's
    * oracle); other T go through `pow`, whose last-ulp behavior is
    * platform-library-defined. */
  def temperatureMixWeights(
      df: DataFrame, strataCol: String, temperature: Double): DataFrame = {
    require(temperature > 0, s"bad temperature=$temperature")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
    val scaled = counts.withColumn("__w",
      (if (temperature == 2.0) sqrt(col("n_docs"))
       else pow(col("n_docs"), lit(1.0 / temperature)))
        .cast("decimal(20,12)"))
    val tot = scaled.agg(
      sum(col("n_docs")).as("__tot_n"),
      sum(col("__w")).as("__tot_w"))
    scaled.crossJoin(broadcast(tot))
      .select(
        col(strataCol),
        col("n_docs"),
        (col("n_docs").cast("double") / col("__tot_n").cast("double"))
          .as("p_raw"),
        (col("__w").cast("double") / col("__tot_w").cast("double"))
          .as("p_temp"))
  }
}
