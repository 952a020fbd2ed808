package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Information-theoretic dependence and diversity over DISCRETE
  * columns — the corpus-composition readouts next to the frequency
  * tests: mutual information ("how much does knowing the language tell
  * you about the source?") and diversity indices ("how concentrated is
  * the corpus?"). Reference analogue: fastETL's QA probes tabulate
  * group counts (`custom_functions.py`); these are the distributed
  * information-theoretic summaries of the same contingency tables.
  *
  * Engine-exactness contract: all corpus-sized reductions are integer
  * counts; each ln() runs once per DISTINCT cell of a BOUNDED domain
  * (the [[Stats.theilIndexByKey]] contract — pre-bin continuous
  * columns upstream) and is quantized to integral micro-nats via
  * floor(1e6·ln x) on a double built from exact sub-2^53 integers —
  * floor-on-double is the catalogued portable quantization (the
  * double→decimal CAST is not). Cell terms then sum exactly; only the
  * closing normalizations are doubles.
  *
  * Scale shape: one corpus scan to the cell table, bounded-size window
  * marginals over it, one scalar reduce — no corpus-sized joins.
  */
object InfoTheory {

  private def i38(c: Column) = c.cast("decimal(38,0)")

  /** floor(1e6·ln(num/den)) as BIGINT — num/den integral DECIMAL(38,0)
    * expressions (count products may pass 2^63, where a BIGINT multiply
    * would wrap on Spark and error on DuckDB), brought to double via
    * the exact 2^53 hi/lo split, one fixed-shape ln, floored to
    * micro-nats. */
  private def lnMicro(num: Column, den: Column): Column =
    floor(log(LinearModel.intMomentToDouble(i38(num), 1.0) /
      LinearModel.intMomentToDouble(i38(den), 1.0)) * lit(1e6))
      .cast("long")

  /** Mutual information of two discrete columns, with the marginal
    * entropies and the normalized readout:
    * MI = Σ_xy p(x,y)·ln(p(x,y)/(p(x)p(y))), H via the dual form
    * H(X) = ln N − (1/N)·Σ_x c_x·ln c_x (keeps every ln argument an
    * integer ratio). NMI = MI/sqrt(H(X)·H(Y)) — 0 independent, 1 when
    * either determines the other.
    *
    * Null-complete rows are dropped (a null category is absence, not a
    * level). Output (one row): n, n_cells, h_x, h_y, mi, nmi (nmi null
    * when either entropy is 0 — a constant column carries no
    * information to normalize by). */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("cxy"))
    val wx = org.apache.spark.sql.expressions.Window.partitionBy(col("__x"))
    val wy = org.apache.spark.sql.expressions.Window.partitionBy(col("__y"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val marg = cells
      .withColumn("cx", sum(col("cxy")).over(wx))
      .withColumn("cy", sum(col("cxy")).over(wy))
      .withColumn("n", sum(col("cxy")).over(wAll))
    // per-cell micro-nat terms: c·floor(1e6·ln(ratio-of-exact-ints))
    val agg = marg.agg(
      max(col("n")).as("n"),
      count(lit(1)).as("n_cells"),
      sum(i38(col("cxy")) *
        lnMicro(i38(col("cxy")) * col("n"), i38(col("cx")) * col("cy")))
        .as("smi"),
      // marginal Σ c_x ln c_x: each x-group repeats its (cx, ln cx)
      // across its cells — divide the per-cell contribution's weight
      // via cxy: Σ_cells cxy·ln(cx) = Σ_x cx·ln(cx). Same for y.
      sum(i38(col("cxy")) * lnMicro(col("cx"), lit(1L))).as("sex"),
      sum(i38(col("cxy")) * lnMicro(col("cy"), lit(1L))).as("sey"))
    val nD = col("n").cast("double")
    def over(s: String) =
      LinearModel.intMomentToDouble(col(s), 1.0) / (nD * lit(1e6))
    val hx = log(nD) - over("sex")
    val hy = log(nD) - over("sey")
    val mi = over("smi")
    agg.select(col("n"), col("n_cells"),
      hx.as("h_x"), hy.as("h_y"), mi.as("mi"),
      when(hx > 0.0 && hy > 0.0, mi / sqrt(hx * hy)).as("nmi"))
  }

  /** Per-key diversity of a discrete `speciesCol`: richness (distinct
    * levels), Simpson concentration λ = Σ nᵢ(nᵢ−1)/(N(N−1)) (the
    * probability two draws WITHOUT replacement match — exact rational),
    * its Gini-Simpson complement 1−λ, and Shannon H with its effective
    * species count e^H (via the same dual-form micro-nat waypoints as
    * [[mutualInfo]]; exp is one closing call on the already-quantized
    * H — fixed shape, replayed by the oracle).
    *
    * Output: key, n, richness, simpson, gini_simpson, shannon,
    * eff_species — Simpson forms null when n < 2. */
  def diversityByKey(df: DataFrame, keyCol: String,
      speciesCol: String): DataFrame = {
    val counts = df.filter(col(speciesCol).isNotNull)
      .groupBy(col(keyCol), col(speciesCol)).agg(count(lit(1)).as("c"))
    val agg = counts.groupBy(col(keyCol)).agg(
      sum(col("c")).as("n"),
      count(lit(1)).as("richness"),
      sum(i38(col("c")) * (col("c") - 1)).as("smatch"),
      sum(i38(col("c")) * lnMicro(col("c"), lit(1L))).as("slnc"))
    val nD = col("n").cast("double")
    val lambda = LinearModel.intMomentToDouble(col("smatch"), 1.0) /
      (nD * (nD - lit(1.0)))
    val shannon = log(nD) -
      LinearModel.intMomentToDouble(col("slnc"), 1.0) / (nD * lit(1e6))
    agg.select(col(keyCol), col("n"), col("richness"),
      when(col("n") >= 2, lambda).as("simpson"),
      when(col("n") >= 2, lit(1.0) - lambda).as("gini_simpson"),
      shannon.as("shannon"),
      exp(shannon).as("eff_species"))
  }
}
