package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals: given a calibration set of
  * absolute residuals, the (1-α) conformal radius q̂ is the k-th
  * smallest calibration residual with k = ⌈(1-α)·(n_cal+1)⌉ — the
  * classic finite-sample-valid recipe (Vovk et al.; Lei et al. 2018,
  * "Distribution-Free Predictive Inference for Regression"). Coverage
  * on a held-out test split then certifies the model+interval pair the
  * way a training-data pipeline certifies a quality score before
  * filtering 100 TB with it.
  *
  * Engine-exactness: k is computed in INTEGER arithmetic from a
  * rational coverage level (`covNum`/`covDen`, e.g. 9/10 for 90%), the
  * k-th order statistic is an exact rank selection (its VALUE is
  * tie-order-independent, so no tiebreak column is needed), and
  * coverage is an integer count with a fixed-point ppm ratio.
  *
  * Scale shape: the only per-row sort is the per-key window over the
  * CALIBRATION split — a sampled fraction of the corpus, partitioned by
  * model key. Exact per-key order statistics assume a key's calibration
  * rows fit a task (the [[Stats.ksStatistic]] contract); for unbounded
  * keys use the mergeable-sketch path ([[QuantileSketch]]) and accept
  * rank error. Everything else is aggregates and broadcast joins.
  */
object Conformal {

  /** Per-key conformal radius from a calibration frame that already
    * carries an absolute-residual column. Output: key, n_cal, q_hat
    * (null when the split is too small for the requested coverage,
    * i.e. k > n_cal — the honest answer, not the max residual). */
  def radius(cal: DataFrame, keyCol: String, residCol: String,
      covNum: Int, covDen: Int): DataFrame = {
    require(covNum > 0 && covDen > 0 && covNum < covDen,
      s"coverage must be a proper fraction, got $covNum/$covDen")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(residCol))
    val wAll = Window.partitionBy(col(keyCol))
    // __-prefixed internals: a caller's key column named `k`/`rk` must
    // not be silently overwritten by the rank bookkeeping
    cal.select(col(keyCol), col(residCol),
        row_number().over(w).cast("long").as("__rk"),
        count(lit(1)).over(wAll).as("n_cal"))
      // integer ceil(covNum*(n+1)/covDen) for positive operands, via the
      // integral `div` so both engines do exact integer arithmetic
      .withColumn("__k", expr(
        s"(${covNum}L * (n_cal + 1L) + ${covDen - 1}L) div ${covDen}L"))
      .filter(col("__rk") === col("__k") || (col("__rk") === col("n_cal") &&
        col("__k") > col("n_cal")))
      .select(col(keyCol), col("n_cal"),
        when(col("__k") <= col("n_cal"), col(residCol)).as("q_hat"))
  }

  /** The unbounded-key path: per-key conformal radius from a mergeable
    * KLL sketch ([[QuantileSketch]]) instead of an exact rank — use when
    * a key's calibration rows may NOT fit one task. Reads the plain
    * (1-α) quantile: the finite-sample (n+1)/n correction shifts the
    * target rank by ≤ 1/n, far below the sketch's own rank error ε in
    * exactly the huge-n regime this path exists for (and [[radius]] is
    * the right tool when n is small enough for the correction to
    * matter). Output: key, q_hat (approximate). */
  def radiusSketch(cal: DataFrame, keyCol: String, residCol: String,
      covNum: Int, covDen: Int, sketchK: Int = 200): DataFrame = {
    require(covNum > 0 && covDen > 0 && covNum < covDen,
      s"coverage must be a proper fraction, got $covNum/$covDen")
    val state = QuantileSketch.build(cal, Seq(keyCol), residCol, sketchK)
    QuantileSketch
      .quantiles(state, Seq(keyCol), Seq(covNum.toDouble / covDen), sketchK)
      .select(col(keyCol), col("value").as("q_hat"))
  }

  /** Join the per-key radius onto a test frame and report empirical
    * coverage: key, n_cal, n_test, q_hat, covered, coverage_ppm (floor
    * fixed-point). The radius table is one row per key;
    * `broadcastRadius = true` (default) hints it — pass false when the
    * key domain is corpus-sized (per-domain/per-user models) and let
    * Catalyst/AQE shuffle instead. */
  def coverage(test: DataFrame, rad: DataFrame, keyCol: String,
      residCol: String, broadcastRadius: Boolean = true): DataFrame =
    test.join(if (broadcastRadius) broadcast(rad) else rad, Seq(keyCol))
      .groupBy(col(keyCol)).agg(
        max(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_test"),
        max(col("q_hat")).as("q_hat"),
        sum(when(col(residCol) <= col("q_hat"), 1L).otherwise(0L))
          .as("covered"))
      .withColumn("coverage_ppm", expr("(covered * 1000000L) div n_test"))
}
