package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped statistics with ENGINE-EXACT results: correlation, chi-square
  * contingency, and per-key OLS trend are all computed from DECIMAL
  * partial sums (order-independent, so the shuffle's reduction order
  * can't perturb the value) and finished with a fixed-shape double
  * formula (each double op is IEEE correctly-rounded, so two engines
  * evaluating the same expression tree agree bit-for-bit).
  *
  * Spark's built-in `corr`/`covar_samp` stream doubles through a merge
  * whose result depends on partition boundaries — fine for exploration,
  * unusable for a reproducibility contract. These forms cost the same
  * single aggregation pass.
  *
  * All inputs are cast to DECIMAL(18,2) partials — callers with more
  * fractional precision should pre-scale.
  */
object Stats {

  private def d(c: Column) = c.cast("decimal(18,2)")

  /** Per-key Pearson correlation of (x, y): one groupBy pass collecting
    * n, Σx, Σy, Σxy, Σx², Σy² in decimal, then the textbook formula in
    * doubles. PAIRWISE-COMPLETE: rows where x or y is null are dropped
    * up front (like the built-in corr) — without the filter, n would
    * count rows the sums skip and the moments would silently disagree
    * with each other. Output: key, n (complete pairs), corr (null when
    * either variance is 0). */
  def corrByKey(df: DataFrame, keyCol: String, xCol: String,
                yCol: String): DataFrame = {
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(d(col(xCol))).as("sx"),
      sum(d(col(yCol))).as("sy"),
      sum(d(col(xCol)) * d(col(yCol))).as("sxy"),
      sum(d(col(xCol)) * d(col(xCol))).as("sxx"),
      sum(d(col(yCol)) * d(col(yCol))).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    agg.select(col(keyCol), col("n"),
      when(varX > 0.0 && varY > 0.0,
        (n * sxy - sx * sy) / (sqrt(varX) * sqrt(varY))).as("corr"))
  }

  /** All-pairs correlation matrix over a fixed column list in ONE
    * corpus scan: the pair list explodes per row (k·(k-1)/2 structs —
    * CPU, not shuffle: partial aggregation collapses to one row per
    * pair per task before the exchange), then each pair runs exactly
    * [[corrByKey]]'s decimal-partial/double-formula contract keyed on
    * (col_x, col_y). Null handling is pairwise-complete, same as
    * corrByKey. Output: (col_x, col_y, n, corr), upper triangle only. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "duplicate column in list")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val exploded = df
      .select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("col_x"), lit(b).as("col_y"),
          col(a).cast("double").as("x"), col(b).cast("double").as("y"))
      }: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.x"), col("p.y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val agg = exploded.groupBy(col("col_x"), col("col_y")).agg(
      count(lit(1)).as("n"),
      sum(d(col("x"))).as("sx"),
      sum(d(col("y"))).as("sy"),
      sum(d(col("x")) * d(col("y"))).as("sxy"),
      sum(d(col("x")) * d(col("x"))).as("sxx"),
      sum(d(col("y")) * d(col("y"))).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    agg.select(col("col_x"), col("col_y"), col("n"),
      when(varX > 0.0 && varY > 0.0,
        (n * sxy - sx * sy) / (sqrt(varX) * sqrt(varY))).as("corr"))
  }

  /** Chi-square contingency cells for two categorical columns: observed
    * count, expected count under independence, and the cell's chi²
    * contribution. Rows with a null category are excluded up front —
    * otherwise they'd inflate the margins of cells the inner joins
    * then drop, making every expected count inconsistent with the
    * emitted table. Emitted PER CELL — the total is a sum of doubles,
    * which is reduction-order-dependent, so the exact contract stops at
    * cells (callers needing the statistic sum the small cell table
    * however they like). Margins join back via two broadcast-sized
    * aggregates of the cell table itself — the input is scanned once. */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy(col(aCol)).agg(sum(col("obs")).as("row_total"))
    val colT = cells.groupBy(col(bCol)).agg(sum(col("obs")).as("col_total"))
    val nT = cells.agg(sum(col("obs")).as("grand_total"))
    val joined = cells.join(rowT, Seq(aCol)).join(colT, Seq(bCol))
      .crossJoin(broadcast(nT))
    val exp = col("row_total").cast("double") *
      col("col_total").cast("double") / col("grand_total").cast("double")
    joined.select(col(aCol), col(bCol), col("obs"),
      exp.as("expected"),
      ((col("obs").cast("double") - exp) * (col("obs").cast("double") - exp) /
        exp).as("contrib"))
  }

  /** Per-key OLS trend y = slope * x + intercept: same decimal-partials
    * pass (and pairwise-complete null handling) as corrByKey. Output:
    * key, n, slope, intercept (null slope when x is constant). */
  def trendByKey(df: DataFrame, keyCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(d(col(xCol))).as("sx"),
      sum(d(col(yCol))).as("sy"),
      sum(d(col(xCol)) * d(col(yCol))).as("sxy"),
      sum(d(col(xCol)) * d(col(xCol))).as("sxx"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val denom = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / denom
    agg.select(col(keyCol), col("n"),
      when(denom > 0.0, slope).as("slope"),
      when(denom > 0.0, (sy - slope * sx) / n).as("intercept"))
  }

  /** Per-key Welch two-sample comparison (the A/B-test workhorse: unequal
    * variances, unequal n): rows in group `a` vs group `b` of `groupCol`,
    * compared on `valueCol` within each `keyCol`. Same exactness contract
    * as corrByKey — ONE conditional-aggregation pass collects both
    * groups' decimal partials (no join, no second scan), then fixed-shape
    * double formulas: sample variance `(n·Σx² - (Σx)²) / (n·(n-1))`, the
    * t statistic, and the Welch–Satterthwaite degrees of freedom. Output:
    * key, n_a, n_b, mean_a, mean_b, t, df — t/df null unless both groups
    * have n ≥ 2 and a positive combined standard error. */
  def welchByKey(df: DataFrame, keyCol: String, groupCol: String,
                 a: String, b: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    def side(g: String, suffix: String) = Seq(
      count_if(col(groupCol) === g).as(s"n$suffix"),
      sum(when(col(groupCol) === g, d(v))).as(s"sx$suffix"),
      sum(when(col(groupCol) === g, d(v) * d(v))).as(s"sxx$suffix"))
    val aggCols = side(a, "a") ++ side(b, "b")
    val agg = df
      .filter(v.isNotNull && col(groupCol).isin(a, b))
      .groupBy(col(keyCol))
      .agg(aggCols.head, aggCols.tail: _*)
    def stats(suffix: String) = {
      val n = col(s"n$suffix").cast("double")
      val sx = col(s"sx$suffix").cast("double")
      val sxx = col(s"sxx$suffix").cast("double")
      (n, sx / n, (n * sxx - sx * sx) / (n * (n - lit(1.0))))
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val sea = va / na
    val seb = vb / nb
    val se2 = sea + seb
    val tStat = (ma - mb) / sqrt(se2)
    val dfW = (se2 * se2) /
      (sea * sea / (na - lit(1.0)) + seb * seb / (nb - lit(1.0)))
    val ok = col("na") >= 2 && col("nb") >= 2 && se2 > 0.0
    agg.select(col(keyCol),
      col("na").as("n_a"), col("nb").as("n_b"),
      when(col("na") > 0, ma).as("mean_a"),
      when(col("nb") > 0, mb).as("mean_b"),
      when(ok, tStat).as("t"),
      when(ok, dfW).as("df"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic: `sup |F_a(v) - F_b(v)|`
    * over the pooled values of groups `a` and `b` — the nonparametric
    * "did the distribution shift" companion to [[welchByKey]] (which
    * only sees means). One row: (n_a, n_b, ks).
    *
    * Shape: per-DISTINCT-value counts (the only corpus-sized
    * aggregation) → running sums over the value-ordered distinct table
    * (RANGE-peer ties are collapsed by the distinct groupBy, so a ROWS
    * frame is exact) → max of |fixed-shape ECDF differences|. MAX of
    * exact doubles is reduction-order-independent, so the statistic is
    * engine-reproducible. The running-sum window is over the DISTINCT
    * VALUE table; for continuous scores with corpus-sized distinct
    * domains, pre-round/bin upstream (the distributed-prefix-sum
    * alternative buys nothing a coarser bin doesn't) — the same
    * bin-upstream contract as [[Survival.riskTable]]'s `durationBucket`
    * and [[Discretize.labelEncode]]'s bounded-dictionary rule. */
  def ksStatistic(df: DataFrame, groupCol: String, a: String, b: String,
      valueCol: String): DataFrame = {
    val perValue = df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(a, b))
      .groupBy(col(valueCol))
      .agg(count_if(col(groupCol) === a).as("ca"),
        count_if(col(groupCol) === b).as("cb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = perValue
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
    val totals = perValue.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(totals))
      .select(col("na"), col("nb"),
        abs(col("cuma").cast("double") / col("na").cast("double") -
          col("cumb").cast("double") / col("nb").cast("double")).as("__d"))
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(max(col("__d")).as("ks"))
  }

  /** Per-key Gini concentration of a NON-NEGATIVE value (token counts,
    * revenue, document lengths): `G = 2·Σ i·x_(i) / (n·Σx) - (n+1)/n`
    * over the ascending-sorted values — 0 for perfect equality, →1 for
    * total concentration. Rank-weighted sums stay in exact integers
    * (values are fixed to integer units by the caller's column type;
    * equal values commute, so the tie order cannot change Σ i·x), and
    * the closing expression is fixed-shape doubles. Keys with a zero
    * sum or a single row emit null. */
  def giniByKey(df: DataFrame, keyCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(valueCol), col(tieCol))
    val ranked = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .withColumn("__i", row_number().over(w).cast("long"))
    val agg = ranked.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("long")).as("s"),
      sum(col("__i") * col(valueCol).cast("long")).as("ws"))
    agg.select(col(keyCol), col("n"),
      when(col("n") > 1 && col("s") > 0,
        (lit(2L) * col("ws")).cast("double") /
          (col("n").cast("double") * col("s").cast("double")) -
          (col("n") + 1L).cast("double") / col("n").cast("double"))
        .as("gini"))
  }

  /** Per-key Mann-Whitney U rank-sum test of `a` vs `b` — the
    * distribution-free A/B companion to [[welchByKey]] (no normality
    * assumption; robust to the heavy-tailed metrics — revenue, dwell
    * time — Welch is weakest on). Exactness: mid-ranks are carried
    * DOUBLED (for the c ties at a value with `cum` values strictly
    * below, 2·midrank = 2·cum + c + 1 — an integer), so the rank sum,
    * U, and the tie-correction term Σ(c³−c) are all exact decimal
    * integers; only the closing z formula is (fixed-shape) doubles.
    * Work: one groupBy to the per-(key, value) count table, one
    * cumulative window over it (distinct-value sized, never the raw
    * rows), one per-key aggregate. Output: key, n_a, n_b, u (group-a
    * U statistic), z (tie-corrected normal approximation; null when a
    * side is empty or all values tie). */
  def mannWhitneyByKey(df: DataFrame, keyCol: String, groupCol: String,
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
      // doubled rank sum of group a: Σ ca·(2·cum + c + 1)
      sum(i28(col("ca")) *
        (i28(col("cum")) * 2 + i28(col("ca") + col("cb")) + 1)).as("r2a"),
      // tie correction Σ(c³ − c) over the pooled distinct values
      sum(i28(col("ca") + col("cb")) * i28(col("ca") + col("cb")) *
        i28(col("ca") + col("cb")) - i28(col("ca") + col("cb"))).as("ties"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = (col("n_a") + col("n_b")).cast("double")
    // U = R_a − n_a(n_a+1)/2, from the doubled sum: (r2a − n_a(n_a+1)) / 2
    val u = (col("r2a") - i28(col("n_a")) * (i28(col("n_a")) + 1))
      .cast("double") / lit(2.0)
    val sigma2 = na * nb / lit(12.0) *
      ((n + lit(1.0)) - col("ties").cast("double") / (n * (n - lit(1.0))))
    agg.select(col(keyCol), col("n_a"), col("n_b"), u.as("u"),
      when(col("n_a") > 0 && col("n_b") > 0 && sigma2 > 0.0,
        (u - na * nb / lit(2.0)) / sqrt(sigma2)).as("z"))
  }

  /** Per-key Spearman rank correlation: Pearson over mid-ranks, exact.
    * Mid-ranks come from the tie identity 2·midrank = rank_asc +
    * (n+1) − rank_desc (both `rank()`s give ties their MIN rank, so the
    * sum is min+max rank — an integer, no halves). Both directions of
    * both columns windowed over ONE key exchange (four sorts of the
    * same partitioning), then the same decimal-partials Pearson shape
    * as [[corrByKey]] on the doubled ranks — scale-invariant, so
    * doubling cancels. Null-complete pairs are dropped up front. */
  def spearmanByKey(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def wAsc(c: String) = Window.partitionBy(col(keyCol)).orderBy(col(c).asc)
    def wDesc(c: String) = Window.partitionBy(col(keyCol)).orderBy(col(c).desc)
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val nW = Window.partitionBy(col(keyCol))
    val ranked = base
      .withColumn("__n", count(lit(1)).over(nW))
      .withColumn("__rx",
        rank().over(wAsc(xCol)) + (col("__n") + 1) - rank().over(wDesc(xCol)))
      .withColumn("__ry",
        rank().over(wAsc(yCol)) + (col("__n") + 1) - rank().over(wDesc(yCol)))
    val i28 = (c: Column) => c.cast("decimal(28,0)")
    val agg = ranked.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(i28(col("__rx"))).as("sx"), sum(i28(col("__ry"))).as("sy"),
      sum(i28(col("__rx")) * i28(col("__ry"))).as("sxy"),
      sum(i28(col("__rx")) * i28(col("__rx"))).as("sxx"),
      sum(i28(col("__ry")) * i28(col("__ry"))).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    agg.select(col(keyCol), col("n"),
      when(varX > 0.0 && varY > 0.0,
        (n * sxy - sx * sy) / (sqrt(varX) * sqrt(varY))).as("rho"))
  }

  /** Benjamini-Hochberg FDR correction over a table of (test, p-value)
    * rows — the closing step of every multi-metric experiment readout
    * (Welch/Mann-Whitney/DiD per metric, then ONE correction across
    * them so the family-wise false-discovery rate is controlled, not
    * each test's α in isolation). Benjamini & Hochberg 1995.
    *
    * p_adj(i) = min(1, min_{j>=i}( m·p_(j) / j )) over ascending
    * (p, test) order; reject <=> p_adj <= alpha. The raw term m·p/i is
    * a fixed-shape double expression over exact integers and the input
    * p; the suffix min and the cap are selections — no accumulation —
    * so results are engine-exact given identical p inputs.
    *
    * SCALE CONTRACT (same as [[ksStatistic]]'s distinct-value window):
    * the window runs un-partitioned over the TESTS table, whose size is
    * the number of hypotheses — dozens to thousands — never the corpus.
    * p-values arrive pre-computed from the per-test aggregates.
    *
    * Output: (testCol, pCol, rank, p_adj, reject). */
  def bhAdjust(df: DataFrame, testCol: String, pCol: String,
      alpha: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(pCol), col(testCol))
    val wSuffix = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.currentRow,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val wAll = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.select(col(testCol), col(pCol))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__raw",
        col("__m").cast("double") * col(pCol) / col("rank").cast("double"))
      .withColumn("p_adj", least(lit(1.0), min(col("__raw")).over(wSuffix)))
      .withColumn("reject", col("p_adj") <= alpha)
      .drop("__m", "__raw")
  }
}
