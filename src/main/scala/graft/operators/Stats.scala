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

  /** Per-row ROLLING OLS trend: for every row, the slope of y on x over
    * the trailing `window` rows of its key (ordered by `orderCol`) —
    * the "is this metric locally rising?" readout next to the global
    * [[trendByKey]] and the smoothing EWMA (a slope answers direction
    * AND rate; an average answers neither).
    *
    * Same exactness contract as trendByKey, windowed: all five decimal
    * partial sums ride ONE frame (rowsBetween(-(window-1), 0)) over one
    * per-key sort, and the slope is the fixed-shape double formula per
    * row — order-independent within the frame because decimal addition
    * commutes. Pairwise-complete like trendByKey: a row with null x OR
    * null y contributes to NO partial (n_win included) — it occupies a
    * frame slot but is invisible to the fit, so a null inside the
    * trailing window cannot skew the slope. Rows with fewer than
    * `minRows` complete trailing pairs emit a null slope (a 2-point
    * "trend" is noise; callers pick the floor).
    * Output: input columns + n_win + slope. */
  def rollingTrend(df: DataFrame, keyCol: String, orderCol: String,
      xCol: String, yCol: String, window: Int, minRows: Int = 3)
      : DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(minRows >= 2 && minRows <= window,
      s"minRows must be in [2, window], got $minRows")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(window - 1), 0)
    // pairwise gating: null-x-or-null-y rows vanish from EVERY partial
    // (sum skips nulls; count(gx) skips nulls) — the trendByKey filter,
    // expressed per frame slot.
    val pairOk = col(xCol).isNotNull && col(yCol).isNotNull
    val gx = when(pairOk, d(col(xCol)))
    val gy = when(pairOk, d(col(yCol)))
    val n = count(gx).over(w)
    val sx = sum(gx).over(w)
    val sy = sum(gy).over(w)
    val sxy = sum(gx * gy).over(w)
    val sxx = sum(gx * gx).over(w)
    val nD = n.cast("double")
    val denom = nD * sxx.cast("double") -
      sx.cast("double") * sx.cast("double")
    val slope = (nD * sxy.cast("double") -
      sx.cast("double") * sy.cast("double")) / denom
    df.withColumn("n_win", n)
      .withColumn("slope",
        when(n >= minRows && denom > 0.0, slope))
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

  /** Two-sample Anderson-Darling statistic (Pettitt 1976; Scholz &
    * Stephens 1987 tie-adjusted k-sample form, k = 2, no continuity
    * correction): the tail-sensitive companion of [[ksStatistic]] —
    * KS sees only the single largest ECDF gap, A² integrates the
    * squared gap with 1/(F(1−F)) weighting, so distributional drift in
    * the TAILS (exactly where quality-score and price distributions
    * go wrong) surfaces much earlier.
    *
    * A² = (1/N)·Σ_{i∈{a,b}} (1/n_i)·Σ_{j: B_j<N}
    *        l_j·(N·M_ij − n_i·B_j)²/(B_j·(N−B_j))
    * over the DISTINCT pooled values (l = pooled multiplicity, B =
    * pooled cumulative, M_i = sample-i cumulative). Every inner term
    * is one micro integral division of exact integers
    * ([[Inference.microDiv]]), the sums are order-independent
    * integers converted through the 2^53 hi/lo split, and the closing
    * combination is fixed-shape. Width contract: 1e6·l·(N·M − n·B)²
    * must fit DECIMAL(38) — pooled n up to ~1e6; beyond that, pre-bin
    * (the [[ksStatistic]] distinct-value contract applies anyway).
    * Output one row: n_a, n_b, a2. */
  def andersonDarling2(df: DataFrame, groupCol: String, a: String,
      b: String, valueCol: String,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    val i38 = (c: Column) => c.cast("decimal(38,0)")
    // retained: the cumulative window and the totals row both read it
    val perValue = scope.retain(df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(a, b))
      .groupBy(col(valueCol))
      .agg(count_if(col(groupCol) === a).as("ca"),
        count_if(col(groupCol) === b).as("cb")))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = perValue
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
    val totals = perValue.agg(sum(col("ca")).cast("long").as("na"),
      sum(col("cb")).cast("long").as("nb"))
    val base = cum.crossJoin(broadcast(totals))
      .withColumn("nn", col("na") + col("nb"))
      .withColumn("bb", col("cuma") + col("cumb"))
      .withColumn("l", col("ca") + col("cb"))
      .filter(col("bb") < col("nn"))
    def side(cumC: String, nC: String) = {
      val dev = i38(col("nn")) * col(cumC) - i38(col(nC)) * col("bb")
      Inference.microDiv(
        lit(1000000).cast("decimal(38,0)") * col("l") * (dev * dev),
        col("bb") * (col("nn") - col("bb")))
    }
    val agg = base.agg(
      max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
      sum(side("cuma", "na")).as("sa"),
      sum(side("cumb", "nb")).as("sb"))
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val a2 = (LinearModel.intMomentToDouble(col("sa"), 1.0e6) / naD +
      LinearModel.intMomentToDouble(col("sb"), 1.0e6) / nbD) /
      (naD + nbD)
    agg.select(col("n_a").cast("long").as("n_a"),
      col("n_b").cast("long").as("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0, a2).as("a2"))
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

  /** Cohen's kappa (Cohen 1960) per key: chance-corrected agreement
    * between two categorical "raters" — the standard inter-annotator /
    * model-vs-heuristic agreement readout of a labeling pipeline
    * (multi-class; binary is the 2-category case).
    *
    * κ = (p_o − p_e) / (1 − p_e) with p_o = Σ n_ii / n and
    * p_e = Σ_i row_i · col_i / n². Everything accumulates as INTEGER
    * cell counts (one groupBy on (key, a, b), then three aggregates of
    * that small cell table); the only doubles are the final fixed-shape
    * divisions (long→double conversion and IEEE division are both
    * correctly rounded, so the output is engine-exact). The expected-
    * agreement join is INNER on (key, category): a category one rater
    * never uses contributes a zero product, which the inner join drops
    * — identical algebra, no ghost rows.
    *
    * Plan shape: one shuffle on (key, a, b); the margin/diagonal
    * re-aggregations run over the CELL table (bounded by |categories|²
    * per key, never the corpus). Output: key, n, agree, pe_num
    * (Σ row_i·col_i), po, pe, kappa (null for the degenerate p_e = 1).
    */
  def cohenKappa(df: DataFrame, keyCol: String, aCol: String,
      bCol: String,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    // the cell frame is consumed by three aggregations (diagonal, row
    // margins, column margins) — retain it so the corpus is scanned
    // ONCE, not once per consumer (the Calibration per-bin-frame
    // precedent; the cell table is |categories|²·keys — cache-trivial)
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(keyCol), col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
    scope.retain(cells)
    val base = cells.groupBy(col(keyCol)).agg(
      sum(col("__c")).as("n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
        .as("agree"))
    val rowT = cells.groupBy(col(keyCol), col("__a").as("__cat"))
      .agg(sum(col("__c")).as("__r"))
    val colT = cells.groupBy(col(keyCol), col("__b").as("__cat"))
      .agg(sum(col("__c")).as("__l"))
    val pe = rowT.join(colT, Seq(keyCol, "__cat"))
      .groupBy(col(keyCol))
      .agg(sum(col("__r") * col("__l")).as("pe_num"))
    val n = col("n").cast("double")
    val agreeD = col("agree").cast("double")
    val peNum = coalesce(col("pe_num"), lit(0L))
    val peD = peNum.cast("double") / (n * n)
    base.join(pe, Seq(keyCol), "left")
      .select(col(keyCol), col("n"), col("agree"), peNum.as("pe_num"),
        (agreeD / n).as("po"), peD.as("pe"),
        when(peD < 1.0, (agreeD / n - peD) / (lit(1.0) - peD)).as("kappa"))
  }

  /** McNemar's test (McNemar 1947) per key: did a paired binary
    * labeler CHANGE relative to another — e.g. model-v2 vs model-v1 on
    * the same rows, before/after a cleaning pass? Only the DISCORDANT
    * cells matter: b = (a=1, b=0), c = (a=0, b=1), χ² = (b−c)²/(b+c),
    * 1 df. The marginal-homogeneity companion to [[cohenKappa]]
    * (agreement): kappa asks "do they agree", McNemar asks "do they
    * disagree in one direction".
    *
    * Engine-exact: b and c are integer conditional counts off ONE
    * aggregation pass; χ² is one fixed-shape double expression (null
    * when b + c = 0 — no discordance, nothing to test). `aCol`/`bCol`
    * must be 0/1 longs; null-labeled rows are excluded (pairwise
    * complete). Output: key, n, b, c, chi2. */
  def mcnemar(df: DataFrame, keyCol: String, aCol: String,
      bCol: String): DataFrame = {
    val agg = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(keyCol)).agg(
        count(lit(1)).as("n"),
        count_if(col(aCol) === 1 && col(bCol) === 0).as("b"),
        count_if(col(aCol) === 0 && col(bCol) === 1).as("c"))
    val d = (col("b") - col("c")).cast("double")
    agg.select(col(keyCol), col("n"), col("b"), col("c"),
      when(col("b") + col("c") > 0,
        d * d / (col("b") + col("c")).cast("double")).as("chi2"))
  }

  /** Fleiss' kappa (Fleiss 1971): chance-corrected agreement for r > 2
    * raters — the multi-annotator generalization of [[cohenKappa]]
    * (label-quality gate for crowd-labeled training data).
    *
    * Input is the RATING TABLE (subject, category), one row per
    * individual rating; `raters` is the required ratings-per-subject r.
    * Subjects with a different rating count are EXCLUDED (the
    * pairwise-complete convention — partial panels don't satisfy the
    * fixed-r formula) and reported in `n_excluded`.
    *
    * All moments are integers: A = Σ_i Σ_j n_ij² (per-subject-category
    * squared counts), B = Σ_j c_j² (squared category totals), N
    * subjects; P̄ = (A − Nr)/(Nr(r−1)), P̄_e = B/(Nr)², κ one
    * fixed-shape double over them. B is DECIMAL-widened (c_j² overflows
    * a long near 3·10⁹ total ratings). Output one row per `keyCol`
    * group: key, n_subjects, n_excluded, a_sum, b_sum, p_bar, p_e,
    * kappa (null when P̄_e = 1). */
  def fleissKappa(df: DataFrame, keyCol: String, subjectCol: String,
      categoryCol: String, raters: Int,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(raters >= 2, s"raters must be >= 2, got $raters")
    // cnt feeds the per-subject moments AND the category totals;
    // perSubject feeds eligibility AND exclusion counting. Without
    // retention each consumer re-derives from the corpus (a measured
    // 8 parquet scans in the query plan); both frames are
    // subject-bounded (≈ input/r rows), far below corpus size.
    val cnt = scope.retain(df
      .filter(col(subjectCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(keyCol), col(subjectCol), col(categoryCol))
      .agg(count(lit(1)).as("__nij")))
    val perSubject = scope.retain(cnt
      .groupBy(col(keyCol), col(subjectCol))
      .agg(sum(col("__nij")).as("__r"),
        sum(col("__nij") * col("__nij")).as("__sq")))
    val eligible = perSubject.filter(col("__r") === raters)
    val excluded = perSubject.groupBy(col(keyCol))
      .agg(count_if(col("__r") =!= raters).as("n_excluded"))
    val a = eligible.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_subjects"), sum(col("__sq")).as("a_sum"))
    val catTot = cnt
      .join(eligible.select(col(keyCol), col(subjectCol)),
        Seq(keyCol, subjectCol), "left_semi")
      .groupBy(col(keyCol), col(categoryCol))
      .agg(sum(col("__nij")).as("__cj"))
    val b = catTot.groupBy(col(keyCol))
      .agg(sum(expr("CAST(__cj AS DECIMAL(38,0)) * __cj"))
        .cast("decimal(38,0)").as("b_sum"))
    val nr = col("n_subjects").cast("double") * lit(raters.toDouble)
    val pBar = (col("a_sum").cast("double") - nr) /
      (nr * lit((raters - 1).toDouble))
    val pE = col("b_sum").cast("double") / (nr * nr)
    a.join(b, Seq(keyCol), "left").join(excluded, Seq(keyCol), "left")
      .select(col(keyCol), col("n_subjects"),
        coalesce(col("n_excluded"), lit(0L)).as("n_excluded"),
        col("a_sum"), col("b_sum").cast("double").as("b_sum"),
        pBar.as("p_bar"), pE.as("p_e"),
        when(pE < 1.0, (pBar - pE) / (lit(1.0) - pE)).as("kappa"))
  }

  /** Mantel–Haenszel common odds ratio (Mantel & Haenszel 1959):
    * exposure→outcome association POOLED ACROSS STRATA — the
    * Simpson's-paradox-safe readout (a confounder that differs by
    * stratum inverts naive pooled odds; MH weights each stratum's
    * 2×2 by its own size). a/b/c/d are the per-stratum cells
    * (exposed-outcome, exposed-no, unexposed-outcome, unexposed-no).
    *
    * OR_MH = Σ_i (aᵢdᵢ/nᵢ) / Σ_i (bᵢcᵢ/nᵢ): each stratum term is one
    * integral division in MICRO units of DECIMAL-widened products, the
    * two sums are integer (order-independent), the ratio one
    * fixed-shape double. `exposureCol`/`outcomeCol` must be 0/1 longs;
    * null-labeled rows excluded. Output one row: n_strata, n, ad_micro,
    * bc_micro, or_mh (null when the denominator sum is 0). */
  def mantelHaenszel(df: DataFrame, stratumCol: String,
      exposureCol: String, outcomeCol: String): DataFrame = {
    val cells = df
      .filter(col(exposureCol).isNotNull && col(outcomeCol).isNotNull)
      .groupBy(col(stratumCol)).agg(
        count(lit(1)).as("__n"),
        count_if(col(exposureCol) === 1 && col(outcomeCol) === 1).as("__a"),
        count_if(col(exposureCol) === 1 && col(outcomeCol) === 0).as("__b"),
        count_if(col(exposureCol) === 0 && col(outcomeCol) === 1).as("__c"),
        count_if(col(exposureCol) === 0 && col(outcomeCol) === 0).as("__d"))
    val terms = cells
      .withColumn("__ad", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * __a * __d) div __n AS BIGINT)"))
      .withColumn("__bc", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * __b * __c) div __n AS BIGINT)"))
    terms.agg(count(lit(1)).as("n_strata"), sum(col("__n")).as("n"),
        sum(col("__ad")).as("ad_micro"), sum(col("__bc")).as("bc_micro"))
      .select(col("n_strata"), col("n"), col("ad_micro"), col("bc_micro"),
        when(col("bc_micro") > 0,
          col("ad_micro").cast("double") / col("bc_micro").cast("double"))
          .as("or_mh"))
  }

  /** Cramér's V (Cramér 1946): strength of association between two
    * categorical columns, the [0,1]-normalized companion of
    * [[chiSquareCells]] — V = sqrt(χ² / (n · (min(r,c) − 1))).
    *
    * ENGINE-EXACT where chiSquareCells deliberately stops: each cell's
    * χ² contribution is ONE integral division in MICRO units of exact
    * integer products, `(1e6 · (n·obs − row·col)²) div (n · row · col)`
    * (BigInt — no width ceiling), so the statistic is an
    * order-independent INTEGER sum and V one fixed-shape double over
    * it; a SQL oracle replays the identical algebra in HUGEINT.
    *
    * UNOBSERVED cells (obs = 0) contribute their expected count E to
    * χ² but never appear in the observed-cell table; rather than
    * materialize the r×c grid, their total rides the identity
    * `Σ_all E = n` ⇒ `Σ_missing E = n − Σ_observed E`, with each
    * observed E as one more micro division — so the correction is two
    * integer sums, grid-free. (Per-cell integral rounding bounds the
    * micro total within |cells| micro units of the real-valued χ² —
    * deterministic, identically replayed by the oracle.)
    *
    * Plan shape: ONE corpus scan to the (a, b) cell aggregate, which is
    * then collected — bounded by r·c rows, small by the definition of
    * categorical columns (the isotonicFromBins bounded-collect
    * precedent) — and finished driver-side. Output one row: n, r, c,
    * chi2_micro, v (null when the table is degenerate — a single row
    * or column category). */
  def cramersV(df: DataFrame, aCol: String, bCol: String,
      maxCells: Int = graft.core.BoundedCollect.DefaultMaxCells)
      : DataFrame = {
    // ONE corpus pass to the cell table, then the statistic is computed
    // driver-side over the COLLECTED cells — bounded by r·c rows (a
    // contingency table over genuine categoricals is small by
    // definition; the isotonicFromBins corpus-size-independent-collect
    // precedent). BigInt arithmetic replays the exact integral-division
    // micro algebra, so the result is identical to the relational form
    // this replaced — and the plan is one scan, no persist, no join
    // (the prior cells-persist + broadcast-scalar shape timed at
    // 7–15 s inside the bench harness from cache/broadcast churn;
    // this is sub-second and strictly simpler).
    val spark = df.sparkSession
    // guarded: limit(N+1)-collect caps driver memory structurally and
    // fails fast when a high-cardinality column masquerades as a
    // categorical, instead of OOMing the driver (VERDICT r11 item).
    val cells = graft.core.BoundedCollect.rows(
      df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
        .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
        .agg(count(lit(1)).as("__obs")),
      maxCells,
      "cramersV contingency cells (r*c)")
    val rows = cells.map(r => (r.get(0), r.get(1), r.getLong(2)))
    val rowT = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val colT = rows.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val n = rows.map(_._3).sum
    val (r, c) = (rowT.size.toLong, colT.size.toLong)
    val micro = BigInt(1000000)
    var chi = BigInt(0)
    var eObs = BigInt(0)
    rows.foreach { case (a, b, obs) =>
      val (rt, ct) = (BigInt(rowT(a)), BigInt(colT(b)))
      val diff = BigInt(n) * obs - rt * ct
      chi += (micro * diff * diff) / (BigInt(n) * rt * ct)
      eObs += (micro * rt * ct) / BigInt(n)
    }
    // unobserved-cell correction: Σ_missing E = n − Σ_observed E
    val chi2Micro = (chi + (micro * n - eObs)).toLong
    val v: java.lang.Double =
      if (math.min(r, c) - 1 > 0)
        math.sqrt(chi2Micro.toDouble /
          (1000000.0 * n.toDouble * (math.min(r, c) - 1).toDouble))
      else null
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(n, r, c, chi2Micro, v)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("r",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("chi2_micro",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
  }

  /** Gumbel extreme-value fit by method of moments over BLOCK MAXIMA
    * (Gumbel 1958): "how bad does the worst-per-block get, and what is
    * the T-block return level?" — the tail-risk readout behind latency
    * ceilings, worst-document sizes, daily peak loads. β̂ = s·√6/π,
    * μ̂ = x̄ − γ·β̂ (Euler–Mascheroni γ), and the T-block return level
    * x_T = μ̂ − β̂·ln(−ln(1 − 1/T)).
    *
    * Exactness: block maxima are exact decimal maxes, their moments
    * exact decimal sums (one grouped pass + one row), and every
    * constant (γ, √6/π, the return-quantile ln(−ln(·))) enters BOTH
    * engines as the same precomputed double literal — no runtime libm
    * call anywhere, so the fit is bit-exact by construction. Output
    * one row: n_blocks, mean_max, mu, beta, return_level (null when
    * fewer than 2 blocks or zero variance). */
  def gumbelFit(df: DataFrame, blockCol: String, valueCol: String,
      returnPeriod: Int = 20): DataFrame = {
    require(returnPeriod >= 2, s"returnPeriod >= 2, got $returnPeriod")
    val maxima = df
      .filter(col(valueCol).isNotNull && col(blockCol).isNotNull)
      .groupBy(col(blockCol)).agg(max(d(col(valueCol))).as("__m"))
    val agg = maxima.agg(count(lit(1)).as("n_blocks"),
      sum(col("__m")).as("sx"),
      sum(col("__m") * col("__m")).as("sxx"))
    val nD = col("n_blocks").cast("double")
    val mean = col("sx").cast("double") / nD
    val varS = (nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")) /
      (nD * (nD - lit(1.0)))
    val beta = sqrt(varS) * lit(GumbelSqrt6OverPi)
    val mu = mean - lit(EulerGamma) * beta
    val q = -math.log(-math.log(1.0 - 1.0 / returnPeriod))
    val ok = col("n_blocks") >= 2 && varS > 0.0
    agg.select(col("n_blocks"), mean.as("mean_max"),
      when(ok, mu).as("mu"), when(ok, beta).as("beta"),
      when(ok, mu + beta * lit(q)).as("return_level"))
  }

  /** √6/π and γ as shared double literals — both engines must see the
    * SAME constants (a runtime sqrt/π would be fine, but literals keep
    * the oracle a copy-paste of the number). */
  private[graft] val GumbelSqrt6OverPi: Double =
    math.sqrt(6.0) / math.Pi
  private[graft] val EulerGamma: Double = 0.5772156649015329

  /** Per-key Theil T index (Theil 1967): entropy-based inequality of a
    * POSITIVE value — 0 for perfect equality, ln(n) at maximal
    * concentration. The decomposable companion of [[giniByKey]] (Theil
    * splits exactly into within/between-group terms; Gini does not).
    *
    * T = Σ xᵢ·ln(xᵢ) / (N·μ) − ln(μ), computed over the PER-DISTINCT-
    * VALUE count table (the [[ksStatistic]] collapse): each distinct
    * micro value contributes c·vm·ln(vm) quantized through
    * DECIMAL(30,6) — so the corpus-sized reduction is an exact decimal
    * sum (order-independent), the ln() calls are one per DISTINCT
    * value, and the unit of vm cancels in the closing fixed-shape
    * double formula (ln vm − ln μ̂ = ln(vm/μ̂), both in micro units).
    * For heavy continuous domains, pre-bin upstream — the same
    * bounded-distinct contract as [[ksStatistic]].
    *
    * Output: key, n, theil (null when n = 0; non-positive values are
    * excluded — Theil is defined on positive quantities). */
  def theilIndexByKey(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val vm = (d(col(valueCol)) * 100).cast("long")
    val perValue = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(keyCol), vm.as("vm"))
      .filter(col("vm") > 0) // sub-half-micro values would hit ln(0)
      .groupBy(col(keyCol), col("vm"))
      .agg(count(lit(1)).as("c"))
    val term = (col("c").cast("double") * col("vm").cast("double") *
      log(col("vm").cast("double"))).cast("decimal(30,6)")
    val agg = perValue.groupBy(col(keyCol)).agg(
      sum(col("c")).as("n"),
      sum(col("vm").cast("decimal(38,0)") * col("c")).as("s"),
      sum(term).as("xlx"))
    val nD = col("n").cast("double")
    val mu = col("s").cast("double") / nD
    val theil = col("xlx").cast("double") / (nD * mu) - log(mu)
    agg.select(col(keyCol), col("n").cast("long").as("n"),
      when(col("n") > 0, theil).as("theil"))
  }
}
