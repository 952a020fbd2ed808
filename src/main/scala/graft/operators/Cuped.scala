package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED variance-reduced experiment readout (Deng, Xu, Kohavi & Walker,
  * WSDM 2013): adjust each unit's outcome with a pre-experiment
  * covariate, Y' = Y - theta (X - E[X]), theta = cov(X,Y)/var(X) — the
  * industry-standard way to shrink A/B confidence intervals without
  * touching the treatment effect (the adjustment is mean-zero and
  * assignment-independent because X predates assignment).
  *
  * Shape at scale: ONE corpus pass collecting per-variant decimal
  * moment partials (map-side combine), then a two-row aggregate for the
  * pooled moments and a broadcast one-row cross back — the same
  * decimal-partials / fixed-shape-double-formula contract as
  * [[Stats.corrByKey]], so every reported double is engine-exact.
  * Pooled moments are the DECIMAL sums of the per-variant partials
  * (decimal addition is associative-exact) — no second scan.
  *
  * theta is estimated POOLED across variants (the paper's prescription;
  * a per-variant theta would bias the delta). `var_reduction` is the
  * pooled rho² — the fraction of outcome variance the covariate
  * removes; adjusted means shrink toward comparability at exactly that
  * rate. Inputs round through DECIMAL(18,2) like every Stats moment
  * (integer-valued X/Y — counts, cents — are exact). */
object Cuped {

  private def d(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** One row per variant: n, mean_y (raw), mean_y_adj (CUPED), plus the
    * pooled theta and var_reduction repeated on each row. theta, the
    * adjustment and var_reduction are NULL when the covariate has zero
    * pooled variance (nothing to adjust with). */
  def adjustedMeans(df: DataFrame, variantCol: String, yCol: String,
      xCol: String,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    // retained: the variant-level moment table feeds both the pooled
    // aggregate and the final projection — without the persist the
    // corpus scans twice (see CacheScope)
    val per = scope.retain(df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(variantCol))
      .agg(
        count(lit(1)).as("n"),
        sum(d(col(xCol))).as("sx"),
        sum(d(col(yCol))).as("sy"),
        sum(d(col(xCol)) * d(col(yCol))).as("sxy"),
        sum(d(col(xCol)) * d(col(xCol))).as("sxx"),
        sum(d(col(yCol)) * d(col(yCol))).as("syy")))
    val pooled = per.agg(
      sum(col("n")).as("p_n"),
      sum(col("sx")).as("p_sx"),
      sum(col("sy")).as("p_sy"),
      sum(col("sxy")).as("p_sxy"),
      sum(col("sxx")).as("p_sxx"),
      sum(col("syy")).as("p_syy"))

    val nP = col("p_n").cast("double")
    val sxP = col("p_sx").cast("double")
    val syP = col("p_sy").cast("double")
    val sxyP = col("p_sxy").cast("double")
    val sxxP = col("p_sxx").cast("double")
    val syyP = col("p_syy").cast("double")
    val varX = nP * sxxP - sxP * sxP
    val varY = nP * syyP - syP * syP
    val cov = nP * sxyP - sxP * syP

    val meanY = col("sy").cast("double") / col("n").cast("double")
    val meanX = col("sx").cast("double") / col("n").cast("double")
    val pooledMeanX = sxP / nP

    per
      .crossJoin(broadcast(pooled))
      .select(
        col(variantCol),
        col("n"),
        meanY.as("mean_y"),
        when(varX > 0.0,
          meanY - (cov / varX) * (meanX - pooledMeanX)).as("mean_y_adj"),
        when(varX > 0.0, cov / varX).as("theta"),
        when(varX > 0.0 && varY > 0.0,
          (cov * cov) / (varX * varY)).as("var_reduction"))
  }

  /** Difference-in-differences readout: with a 0/1 treatment group and
    * a 0/1 period flag, DiD = (ȳ_treat,post − ȳ_treat,pre) −
    * (ȳ_ctrl,post − ȳ_ctrl,pre) — the parallel-trends estimator for
    * rollouts that can't randomize. The Welch-style standard error sums
    * the four cells' s²/n (each cell is an independent mean under the
    * classical DiD sampling model).
    *
    * ONE global aggregate of 12 conditional decimal partials (map-side
    * combined, no keyed exchange at all), then fixed-shape doubles —
    * every reported value engine-exact. Output one row: the four cell
    * (n, mean) pairs, did, se_did (null if any cell is empty, or for
    * se any cell has n < 2). */
  def diffInDiff(df: DataFrame, treatCol: String, postCol: String,
      yCol: String): DataFrame = {
    val y = col(yCol)
    val t = col(treatCol).cast("int")
    val p = col(postCol).cast("int")
    def cell(ti: Int, pi: Int, suffix: String) = Seq(
      sum(when(t === ti && p === pi && y.isNotNull, 1L).otherwise(0L))
        .as(s"n_$suffix"),
      sum(when(t === ti && p === pi, d(y))).as(s"sy_$suffix"),
      sum(when(t === ti && p === pi, d(y) * d(y))).as(s"syy_$suffix"))
    val aggs = cell(0, 0, "c0") ++ cell(0, 1, "c1") ++
      cell(1, 0, "t0") ++ cell(1, 1, "t1")
    val agg = df.filter(t.isNotNull && p.isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    def nOf(s: String) = col(s"n_$s").cast("double")
    def meanOf(s: String) = col(s"sy_$s").cast("double") / nOf(s)
    // s²/n per cell: (syy - sy²/n) / (n-1) / n, fixed shape
    def varTerm(s: String) = {
      val sy = col(s"sy_$s").cast("double")
      val syy = col(s"syy_$s").cast("double")
      (syy - sy * sy / nOf(s)) / (nOf(s) - lit(1.0)) / nOf(s)
    }
    val allCells = Seq("c0", "c1", "t0", "t1")
    val nonEmpty = allCells.map(s => col(s"n_$s") > 0L).reduce(_ && _)
    val seOk = allCells.map(s => col(s"n_$s") > 1L).reduce(_ && _)
    val did = (meanOf("t1") - meanOf("t0")) - (meanOf("c1") - meanOf("c0"))
    val se = sqrt(varTerm("t1") + varTerm("t0") +
      varTerm("c1") + varTerm("c0"))
    agg.select(
      (allCells.flatMap(s => Seq(col(s"n_$s"),
        when(col(s"n_$s") > 0L, meanOf(s)).as(s"mean_$s"))) ++ Seq(
        when(nonEmpty, did).as("did"),
        when(seOk, se).as("se_did"))): _*)
  }
}
