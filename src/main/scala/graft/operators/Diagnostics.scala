package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-assumption diagnostics — the "should I trust the simpler
  * test?" layer over [[Stats]]/[[Inference]]: single-outlier detection
  * (Grubbs), variance homogeneity (Bartlett — the parametric sharp
  * edge beside the robust Brown-Forsythe), and residual
  * autocorrelation (Durbin-Watson, the validity check for every
  * trendByKey-style OLS readout).
  *
  * Engine-exactness: the usual contract — cents quantization, integer
  * moment sums in DECIMAL(38,0), per-group ln/reciprocal terms
  * quantized to integral waypoints BEFORE any cross-group sum (a raw
  * double sum over groups would be order-dependent), closing formulas
  * fixed-shape doubles through the 2^53 hi/lo split.
  */
object Diagnostics {

  private def d(c: Column) = c.cast("decimal(18,2)")
  private def i38(c: Column) = c.cast("decimal(38,0)")
  private def dv(c: Column) = LinearModel.intMomentToDouble(c, 1.0)

  /** Per-key Grubbs statistic G = max|x − mean|/sd — closed-form from
    * (n, Σx, Σx², min, max) alone: the farthest point is always the
    * min or the max, so no per-row deviation pass exists at all. Ties
    * between the two sides resolve to the MAX side (total rule).
    * Output: key, n, g, outlier_value — null G when n < 3 or sd = 0
    * (Grubbs is undefined below 3 points). */
  def grubbsByKey(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val vm = (d(col(valueCol)) * 100).cast("long")
    val agg = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), vm.as("vm"))
      .groupBy(col(keyCol)).agg(
        count(lit(1)).as("n"),
        sum(i38(col("vm"))).as("s"),
        sum(i38(col("vm")) * col("vm")).as("q"),
        min(col("vm")).as("mn"),
        max(col("vm")).as("mx"))
    val nD = col("n").cast("double")
    val mean = dv(col("s")) / nD
    val sd = sqrt((nD * dv(col("q")) - dv(col("s")) * dv(col("s"))) /
      (nD * (nD - lit(1.0))))
    val devHi = col("mx").cast("double") - mean
    val devLo = mean - col("mn").cast("double")
    val g = greatest(devHi, devLo) / sd
    val ok = col("n") >= 3 && sd > 0.0
    agg.select(col(keyCol), col("n"),
      when(ok, g).as("g"),
      when(ok, when(devHi >= devLo, col("mx")).otherwise(col("mn"))
        .cast("double") / lit(100.0)).as("outlier_value"))
  }

  /** Per-key Bartlett homogeneity-of-variances test over the groups of
    * `groupCol`: K² = [(N−k)·ln(Sp²) − Σ(nᵢ−1)·ln(Sᵢ²)] / C with
    * C = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1)). Cross-group sums ride
    * waypoints: each group's (nᵢ−1)·Sᵢ² passes the exact integral
    * micro-division (1e6·(nq−s²)) div n, its ln term quantizes via
    * floor(1e6·term) to a long (the lnMicro convention), and 1/(nᵢ−1)
    * quantizes to the exact integral division 1e12 div (nᵢ−1) — so
    * every reduction is
    * order-independent and only the closing K² shape is live doubles.
    * Variances stay in cents² — the unit cancels exactly between the
    * pooled and per-group ln terms because Σ(nᵢ−1) = N−k.
    *
    * Output: key, n_groups, n, k2 — null when k < 2, any group has
    * nᵢ < 2, or any group variance is 0 (ln undefined). */
  def bartlettByKey(df: DataFrame, keyCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val vm = (d(col(valueCol)) * 100).cast("long")
    val perG = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(keyCol), col(groupCol), vm.as("vm"))
      .groupBy(col(keyCol), col(groupCol)).agg(
        count(lit(1)).as("ng"),
        sum(i38(col("vm"))).as("s"),
        sum(i38(col("vm")) * col("vm")).as("q"))
    // (n−1)·S² = (n·q − s²)/n, exact in micro-cents² via the
    // remainder-subtract division (Inference.microDiv shape)
    val num = i38(col("ng")) * col("q") - col("s") * col("s")
    val ssMicro = ((num * 1000000L - (num * 1000000L) % col("ng")) /
      col("ng")).cast("decimal(38,0)")
    val sg2 = dv(ssMicro) / lit(1.0e6) /
      (col("ng").cast("double") - lit(1.0))
    // floor(1e6·term): pure IEEE floor on an identically-shaped double,
    // bit-identical across engines — the lnMicro convention (a
    // double→DECIMAL cast here would straddle Spark's shortest-repr
    // rounding vs DuckDB's binary-value rounding, the InfoTheory
    // catalogued non-portable path)
    val lnTerm = floor(((col("ng").cast("double") - lit(1.0)) * log(sg2))
      * lit(1.0e6)).cast("long")
    val recip = ((lit(1000000000000L) -
      lit(1000000000000L) % (col("ng") - 1)) / (col("ng") - 1))
      .cast("long")
    val scored = perG
      .withColumn("ss_micro", ssMicro)
      .withColumn("ln_term",
        when(col("ng") >= 2 && ssMicro > 0, lnTerm))
      .withColumn("recip", when(col("ng") >= 2, recip))
    val agg = scored.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_groups"),
      sum(col("ng")).as("n"),
      min(col("ng")).as("min_ng"),
      min(col("ss_micro")).as("min_ss"),
      sum(col("ss_micro")).as("ss_all"),
      sum(col("ln_term")).as("ln_sum"),
      sum(col("recip")).as("recip_sum"))
    val nD = col("n").cast("double")
    val kD = col("n_groups").cast("double")
    val dfree = nD - kD
    val sp2 = dv(col("ss_all")) / lit(1.0e6) / dfree
    val c = lit(1.0) +
      (col("recip_sum").cast("double") / lit(1.0e12) - lit(1.0) / dfree) /
        (lit(3.0) * (kD - lit(1.0)))
    val k2 = (dfree * log(sp2) -
      col("ln_sum").cast("double") / lit(1.0e6)) / c
    val ok = col("n_groups") >= 2 && col("min_ng") >= 2 &&
      col("min_ss") > 0
    agg.select(col(keyCol), col("n_groups"), col("n").cast("long").as("n"),
      when(ok, k2).as("k2"))
  }

  /** Per-key Durbin-Watson residual autocorrelation: fit y on x by OLS
    * (the [[Stats.trendByKey]] decimal-moment fit), then
    * DW = Σ(eₜ − eₜ₋₁)² / Σeₜ² over the `orderCol`-ordered residual
    * series — ≈2 white, →0 positively autocorrelated (the "my trend
    * line is lying to me" alarm). Residuals quantize via floor(e·1e6)
    * (exact integers from identical fixed-shape doubles), so both
    * quadratic sums are exact DECIMAL(38,0) reductions and DW is one
    * closing division. `orderCol` must be unique per key (a tied order
    * has no defined lag). Output: key, n, b0, b1, dw (null when n < 3
    * or the fit is degenerate or all residuals are 0). */
  def durbinWatsonByKey(df: DataFrame, keyCol: String, orderCol: String,
      xCol: String, yCol: String,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    val base = scope.retain(df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol), col(orderCol),
        (d(col(xCol)) * 100).cast("long").as("xc"),
        (d(col(yCol)) * 100).cast("long").as("yc")))
    val mom = base.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(i38(col("xc"))).as("sx"),
      sum(i38(col("yc"))).as("sy"),
      sum(i38(col("xc")) * col("yc")).as("sxy"),
      sum(i38(col("xc")) * col("xc")).as("sxx"))
    val nD = col("n").cast("double")
    val denom = nD * dv(col("sxx")) - dv(col("sx")) * dv(col("sx"))
    // cents moments: the slope is a cents/cents ratio (scale cancels);
    // the intercept lands in cents and rescales once to natural units
    val b1 = (nD * dv(col("sxy")) - dv(col("sx")) * dv(col("sy"))) / denom
    val b0 = (dv(col("sy")) - b1 * dv(col("sx"))) / nD / lit(100.0)
    val coef = mom.select(col(keyCol), col("n"),
      when(denom > 0.0, b0).as("b0"), when(denom > 0.0, b1).as("b1"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol))
    val e6 = floor((col("yc").cast("double") / lit(100.0) -
      (col("b0") + col("b1") *
        (col("xc").cast("double") / lit(100.0)))) * lit(1.0e6))
    val res = base.join(coef, Seq(keyCol))
      .withColumn("e6", e6)
      .withColumn("p6", lag(col("e6"), 1).over(w))
    res.groupBy(col(keyCol)).agg(
        max(col("n")).as("n"),
        max(col("b0")).as("b0"), max(col("b1")).as("b1"),
        sum(when(col("p6").isNotNull,
          i38(col("e6") - col("p6")) * (col("e6") - col("p6"))))
          .as("dnum"),
        sum(i38(col("e6")) * col("e6")).as("dden"))
      .select(col(keyCol), col("n"), col("b0"), col("b1"),
        when(col("n") >= 3 && col("b0").isNotNull &&
          col("dden") > 0, dv(col("dnum")) / dv(col("dden"))).as("dw"))
  }
}
