package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-shape diagnostics and standardized effect sizes — the
  * "how big / how non-normal", complementing the "is it significant"
  * tests in [[Stats]] and [[Inference]]. Reference analogue: fastETL's
  * pandas QA probes (`custom_functions.py`) eyeball distributions
  * before load; these are the distributed, engine-exact versions of
  * that intent, with the decision-relevant readouts (a z-test on 10M
  * rows is always "significant" — the effect size says whether anyone
  * should care).
  *
  * Engine-exactness contract (the [[Stats]] discipline): every
  * corpus-sized reduction is an exact integer sum — values quantized to
  * cents via DECIMAL(18,2), power sums in DECIMAL(38,0) — and the only
  * doubles are closing fixed-shape formulas replayed verbatim by the
  * DuckDB oracle. Moment sums pass the 2^53 hi/lo split
  * ([[LinearModel.intMomentToDouble]]) before the double boundary, the
  * catalogued engine-divergence hazard for int128→double conversion.
  *
  * Scale shape: each operator is ONE corpus scan to a grouped
  * aggregate (Cliff's delta adds one distinct-value-sized window) —
  * no joins on corpus-sized frames, no driver collects.
  */
object EffectSize {

  private def d(c: Column) = c.cast("decimal(18,2)")
  private def i38(c: Column) = c.cast("decimal(38,0)")
  private def dv(c: Column) = LinearModel.intMomentToDouble(c, 1.0)

  /** Per-key Jarque–Bera normality diagnostic from exact integral
    * power sums: skewness g1 = m3/m2^{3/2}, excess-prone kurtosis
    * g2 = m4/m2², JB = n/6·(g1² + (g2−3)²/4). Values quantize to
    * cents; central moments come from raw power sums via the one
    * fixed shape both engines replay (m2·sqrt(m2) instead of
    * pow(·,1.5) keeps every op IEEE-correctly-rounded). Skew and
    * kurtosis are scale-invariant, so the cents unit cancels in
    * exact arithmetic and the residual float noise is identical
    * across engines (same trees, same bits).
    *
    * Output: key, n, skew, kurt, jb — null when n < 2 or the variance
    * is 0 (a constant column has no shape). */
  def jarqueBeraByKey(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val vm = (d(col(valueCol)) * 100).cast("long")
    val agg = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), vm.as("vm"))
      .groupBy(col(keyCol)).agg(
        count(lit(1)).as("n"),
        sum(i38(col("vm"))).as("s1"),
        sum(i38(col("vm")) * col("vm")).as("s2"),
        sum(i38(col("vm")) * col("vm") * col("vm")).as("s3"),
        sum(i38(col("vm")) * col("vm") * col("vm") * col("vm")).as("s4"))
    val nD = col("n").cast("double")
    val m = dv(col("s1")) / nD
    val r2 = dv(col("s2")) / nD
    val r3 = dv(col("s3")) / nD
    val r4 = dv(col("s4")) / nD
    val m2 = r2 - m * m
    val m3 = r3 - lit(3.0) * m * r2 + lit(2.0) * m * m * m
    val m4 = r4 - lit(4.0) * m * r3 + lit(6.0) * m * m * r2 -
      lit(3.0) * m * m * m * m
    val skew = m3 / (m2 * sqrt(m2))
    val kurt = m4 / (m2 * m2)
    val jb = nD / lit(6.0) *
      (skew * skew + lit(0.25) * (kurt - lit(3.0)) * (kurt - lit(3.0)))
    agg.select(col(keyCol), col("n"),
      when(col("n") >= 2 && m2 > 0.0, skew).as("skew"),
      when(col("n") >= 2 && m2 > 0.0, kurt).as("kurt"),
      when(col("n") >= 2 && m2 > 0.0, jb).as("jb"))
  }

  /** Per-key Cohen's d and Hedges' g between groups `a` and `b` of
    * `groupCol` on `valueCol` — the standardized mean difference over
    * the POOLED standard deviation (the meta-analysis convention; the
    * Welch t in [[Stats.welchByKey]] answers significance, this
    * answers magnitude). One conditional-aggregation pass collects
    * both groups' integral cents partials; closing doubles:
    * s_p² = ((n_a−1)v_a + (n_b−1)v_b)/(n_a+n_b−2) with
    * v = (n·q − s²)/(n·(n−1)), d = (mean_a − mean_b)/s_p, and the
    * small-sample correction g = d·(1 − 3/(4(n_a+n_b) − 9)).
    *
    * Output: key, n_a, n_b, mean_a, mean_b, d, g — d/g null unless
    * both groups have n ≥ 2 and the pooled variance is positive. */
  def cohensDByKey(df: DataFrame, keyCol: String, groupCol: String,
      a: String, b: String, valueCol: String): DataFrame = {
    val vm = (d(col(valueCol)) * 100).cast("long")
    def side(g: String, sfx: String) = Seq(
      count_if(col(groupCol) === g).as(s"n$sfx"),
      sum(when(col(groupCol) === g, i38(col("vm")))).as(s"s$sfx"),
      sum(when(col(groupCol) === g, i38(col("vm")) * col("vm")))
        .as(s"q$sfx"))
    val sides = side(a, "a") ++ side(b, "b")
    val agg = df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(a, b))
      .select(col(keyCol), col(groupCol), vm.as("vm"))
      .groupBy(col(keyCol))
      .agg(sides.head, sides.tail: _*)
    val na = col("na").cast("double")
    val nb = col("nb").cast("double")
    def v(n: Column, s: String, q: String) =
      (n * dv(col(q)) - dv(col(s)) * dv(col(s))) / (n * (n - lit(1.0)))
    val va = v(na, "sa", "qa")
    val vb = v(nb, "sb", "qb")
    val sp2 = ((na - lit(1.0)) * va + (nb - lit(1.0)) * vb) /
      (na + nb - lit(2.0))
    // numerator and s_p are both in cents — the unit cancels exactly
    val dEff = (dv(col("sa")) / na - dv(col("sb")) / nb) / sqrt(sp2)
    val g = dEff * (lit(1.0) -
      lit(3.0) / (lit(4.0) * (na + nb) - lit(9.0)))
    val ok = col("na") >= 2 && col("nb") >= 2 && sp2 > 0.0
    agg.select(col(keyCol),
      col("na").as("n_a"), col("nb").as("n_b"),
      (dv(col("sa")) / na / lit(100.0)).as("mean_a"),
      (dv(col("sb")) / nb / lit(100.0)).as("mean_b"),
      when(ok, dEff).as("d"),
      when(ok, g).as("g"))
  }

  /** Per-key Cliff's delta — the ordinal effect size
    * δ = P(X_a > X_b) − P(X_a < X_b) = 2U/(n_a·n_b) − 1, computed
    * EXACTLY from the Mann-Whitney doubled-midrank machinery (ties
    * contribute ½ to U via the midrank identity, which is precisely
    * Cliff's tie convention). Robust companion to [[cohensDByKey]]:
    * no moments, no normality assumption, bounded in [−1, 1].
    *
    * Work: one corpus groupBy to the per-(key, value) count table, one
    * distinct-value-sized window, one key aggregate — U and n_a·n_b
    * stay exact integers, and the doubled-U difference reaches double
    * through the 2^53 hi/lo split, so the readout is engine-portable
    * at any key size (not just below ~10^7 rows per key).
    *
    * Output: key, n_a, n_b, delta (null when either group is empty). */
  def cliffsDeltaByKey(df: DataFrame, keyCol: String, groupCol: String,
      a: String, b: String, valueCol: String): DataFrame = {
    val perValue = df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(a, b))
      .groupBy(col(keyCol), col(valueCol))
      .agg(count_if(col(groupCol) === a).as("ca"),
        count_if(col(groupCol) === b).as("cb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val i28 = (c: Column) => c.cast("decimal(28,0)")
    val cum = perValue.withColumn("cum",
      coalesce(sum(col("ca") + col("cb")).over(w), lit(0L)))
    val agg = cum.groupBy(col(keyCol)).agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      sum(i28(col("ca")) *
        (i28(col("cum")) * 2 + i28(col("ca") + col("cb")) + 1)).as("r2a"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    // U from the doubled rank sum: (r2a − n_a(n_a+1)) / 2 — through the
    // 2^53 hi/lo split, not a raw DECIMAL→double cast: past 2^53 (keys
    // above ~10^7 rows) Spark's BigDecimal rounding and DuckDB's
    // int128→double can disagree in the last ulp, while the split is
    // the same fixed double shape on both engines
    val u = LinearModel.intMomentToDouble(
      col("r2a") - i28(col("n_a")) * (i28(col("n_a")) + 1), 2.0)
    val delta = lit(2.0) * u / (na * nb) - lit(1.0)
    agg.select(col(keyCol), col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0, delta).as("delta"))
  }
}
