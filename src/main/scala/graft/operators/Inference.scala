package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical inference over GROUPS — the k-sample companions of the
  * two-sample family in [[Stats]] (Welch, Mann-Whitney, KS): rank
  * ANOVA (Kruskal-Wallis), spread equality (Brown-Forsythe), matched
  * binary treatments (Cochran's Q), internal consistency (Cronbach's
  * alpha), and variance decomposition (one-way intraclass
  * correlation). Reference analogue: fastETL ships pandas QA probes
  * (`custom_functions.py`) that eyeball per-group distributions; these
  * operators are the distributed, testable versions of that QA intent.
  *
  * Engine-exactness contract (the [[Stats.mannWhitneyByKey]] /
  * [[Stats.mantelHaenszel]] discipline): every corpus-sized reduction
  * is an INTEGER sum — doubled mid-ranks, micro-unit integral
  * divisions (`(1e6·x²) div n` on DECIMAL(38,0)), value micro-units
  * from the DECIMAL(18,2) quantization — so partial-aggregation order
  * can never change a bit; only the closing, fixed-shape scalar
  * formulas are doubles, replayed verbatim by a DuckDB oracle in
  * HUGEINT + DOUBLE.
  *
  * Scale shape: each operator is one corpus scan to a grouped
  * aggregate (plus, for the rank tests, one distinct-value-sized
  * window) — no joins on corpus-sized frames, no driver collects.
  */
object Inference {

  private def d(c: Column) = c.cast("decimal(18,2)")
  private def i38(c: Column) = c.cast("decimal(38,0)")

  /** Exact integral floor-division of a non-negative decimal by a
    * positive integral column, STAYING IN DECIMAL. Spark's `div`
    * operator returns BIGINT and silently wraps once the quotient
    * passes 2^63 (the [[Stats.mantelHaenszel]] micro terms fit a long;
    * squared rank/moment sums at ×1e6 do not) — so subtract the
    * remainder first, making the division exact, and keep (38,0).
    * DuckDB replays with HUGEINT `//` (identical on non-negative
    * operands). */
  private[operators] def microDiv(num: Column, den: Column): Column =
    ((num - num % den) / den).cast("decimal(38,0)")

  /** Kruskal-Wallis H (rank one-way ANOVA) per key over ALL observed
    * groups: did ANY group's value distribution shift? The k-sample
    * generalization of [[Stats.mannWhitneyByKey]], sharing its doubled
    * mid-rank machinery: for the c ties at a value with `cum` values
    * strictly below, 2·midrank = 2·cum + c + 1 (integer), so each
    * group's doubled rank sum R2_g is an exact decimal integer.
    *
    * H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1); the cross-group sum is
    * made order-independent by quantizing each group's term to MICRO
    * units with one integral division, (1e6·R2_g²) div (4·n_g), and
    * summing integers. Tie correction: H' = H / (1 − Σ(c³−c)/(N³−N)),
    * with Σ(c³−c) accumulated exactly as Σ_rows (c²−1)·c_g (summing
    * per-group rows weighted by their counts reconstructs the
    * per-distinct-value total without a second distinct pass).
    *
    * Work: one corpus groupBy to the (key, value, group) count table;
    * two windows over it (per-(key,value) total + cumulative-below,
    * both distinct-value sized); one (key, group) aggregate; one key
    * aggregate. Output: key, n_groups, n, h, h_adj (h_adj null when
    * all values tie; h null when n < 2 or fewer than 2 groups). */
  def kruskalWallisByKey(df: DataFrame, keyCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val perVG = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol), col(groupCol))
      .agg(count(lit(1)).as("cg"))
    val wv = Window.partitionBy(col(keyCol), col(valueCol))
    val wc = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // cum strictly below = inclusive-of-peers running total − this
    // value's pooled count (RANGE frame keeps peers together, so the
    // subtraction is exact whatever the within-value row order).
    val cum = perVG
      .withColumn("c", sum(col("cg")).over(wv))
      .withColumn("cum", sum(col("cg")).over(wc) - col("c"))
    val aggG = cum.groupBy(col(keyCol), col(groupCol)).agg(
      sum(col("cg")).as("n_g"),
      sum(i38(col("cg")) * (i38(col("cum")) * 2 + i38(col("c")) + 1))
        .as("r2"),
      sum((i38(col("c")) * i38(col("c")) - 1) * i38(col("cg"))).as("tiep"))
    val term = microDiv(lit(1000000).cast("decimal(38,0)") *
      col("r2") * col("r2"), col("n_g") * 4)
    val fin = aggG.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_groups"),
      sum(col("n_g")).cast("long").as("n"),
      sum(term).as("s_micro"),
      sum(col("tiep")).as("ties"))
    val nD = col("n").cast("double")
    val h = lit(12.0) * col("s_micro").cast("double") / lit(1000000.0) /
      (nD * (nD + lit(1.0))) - lit(3.0) * (nD + lit(1.0))
    val corrFac = lit(1.0) -
      col("ties").cast("double") / (nD * nD * nD - nD)
    val ok = col("n_groups") >= 2 && col("n") >= 2
    fin.select(col(keyCol), col("n_groups"), col("n"),
      when(ok, h).as("h"),
      when(ok && corrFac > 0.0, h / corrFac).as("h_adj"))
  }

  /** Brown-Forsythe test (Levene with group MEDIAN centers) per key:
    * are the groups' SPREADS equal? The robust variance-equality
    * companion of [[kruskalWallisByKey]] (which sees location, not
    * scale). W = ((N−k)/(k−1)) · Σ n_j(z̄_j − z̄)² / ΣΣ(z_ij − z̄_j)²
    * over z_ij = |x_ij − median_j|.
    *
    * Exactness: values quantize to micro units through DECIMAL(18,2);
    * the doubled group median 2·m_j (interpolated exact `percentile`
    * — the average of two integers, always x.0 or x.5, doubles to an
    * integer) makes every z2_ij = |2x − 2m_j| an exact long, so the
    * per-group sums S_j = Σz2 and Q_j = Σz2² are exact integers. The
    * cross-group Σ S_j²/n_j is quantized per group with one micro
    * integral division and summed as integers (the
    * [[kruskalWallisByKey]] trick); W's quadratic forms are
    * scale-invariant, so the doubling cancels.
    *
    * Work: one corpus groupBy for the medians (group-count sized,
    * broadcast back), one corpus aggregate for the moments, one key
    * aggregate. Output: key, n_groups, n, w (null when k < 2, N ≤ k,
    * or the within-group spread is 0). */
  def brownForsytheByKey(df: DataFrame, keyCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(keyCol), col(groupCol),
        (d(col(valueCol)) * 100).cast("long").as("vm"))
    val med = base.groupBy(col(keyCol), col(groupCol))
      .agg((expr("percentile(vm, 0.5)") * 2).cast("long").as("m2"))
    val z = base.join(broadcast(med), Seq(keyCol, groupCol))
      .select(col(keyCol), col(groupCol),
        abs(col("vm") * 2 - col("m2")).as("z2"))
    val aggG = z.groupBy(col(keyCol), col(groupCol)).agg(
      count(lit(1)).as("n_g"),
      sum(i38(col("z2"))).as("s"),
      sum(i38(col("z2")) * i38(col("z2"))).as("q"))
    val term = microDiv(lit(1000000).cast("decimal(38,0)") *
      col("s") * col("s"), col("n_g"))
    val fin = aggG.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_groups"),
      sum(col("n_g")).cast("long").as("n"),
      sum(term).as("a_micro"),
      sum(col("s")).as("ss"),
      sum(col("q")).as("qq"))
    val nD = col("n").cast("double")
    val kD = col("n_groups").cast("double")
    val aD = col("a_micro").cast("double") / lit(1000000.0)
    val num = aD - col("ss").cast("double") * col("ss").cast("double") / nD
    val den = col("qq").cast("double") - aD
    val w = (nD - kD) / (kD - lit(1.0)) * num / den
    fin.select(col(keyCol), col("n_groups"), col("n"),
      when(col("n_groups") >= 2 && col("n") > col("n_groups") && den > 0.0,
        w).as("w"))
  }

  /** Cochran's Q (Cochran 1950): did the success RATE differ across k
    * matched binary treatments on the same subjects? The k-treatment
    * generalization of [[Stats.mcnemar]] (k = 2 reduces to it).
    * `flagCols` are 0/1 columns, one per treatment, already aligned
    * per subject row (the caller pivots; a missing treatment is a 0 —
    * Cochran's complete-design assumption).
    *
    * Q = (k−1)·(k·ΣC_j² − T²) / (k·ΣR_i − ΣR_i²) with C_j the
    * treatment totals, R_i the per-subject totals, T = ΣR_i. Every
    * term is an exact integer sum (ΣC_j² is a k-term literal over the
    * aggregate row, not a data-order reduction); Q is one fixed-shape
    * double. Output one row: n_subjects, t, q (null when the
    * denominator is 0 — all subjects all-0 or all-1). */
  def cochranQ(df: DataFrame, flagCols: Seq[String]): DataFrame = {
    require(flagCols.size >= 2, "cochranQ needs >= 2 treatment columns")
    val k = flagCols.size
    val r = flagCols.map(c => col(c).cast("long")).reduce(_ + _)
    val aggCols =
      flagCols.map(c => sum(col(c).cast("long")).as(s"c_$c")) ++ Seq(
        count(lit(1)).as("n_subjects"),
        sum(r).as("t"),
        sum(i38(r) * i38(r)).as("r2"))
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
    val sumC2 = flagCols
      .map(c => i38(col(s"c_$c")) * i38(col(s"c_$c")))
      .reduce(_ + _)
    val num = (lit(k.toLong - 1) *
      (lit(k.toLong) * sumC2 - i38(col("t")) * i38(col("t"))))
      .cast("double")
    val den = (lit(k.toLong) * i38(col("t")) - i38(col("r2")))
      .cast("double")
    agg.select(col("n_subjects"), col("t").cast("long").as("t"),
      when(den > 0.0, num / den).as("q"))
  }

  /** Cronbach's alpha per key: internal consistency of k item columns
    * — do the items measure one underlying quantity? α = k/(k−1) ·
    * (1 − Σ_i var_i / var_total) with var_total the variance of the
    * per-row item sum.
    *
    * Exactness: every variance shares the denominator n(n−1), so α
    * reduces to k/(k−1) · (Δ_tot − Σ_i Δ_i)/Δ_tot over the EXACT
    * DECIMAL numerators Δ = n·Σx² − (Σx)² — items cross-covary, so
    * Σvar_i/var_tot ≈ 1 and the naive double form would amplify a
    * single decimal→double conversion ulp by ~1/α; keeping the
    * subtraction in decimal removes the cancellation entirely. The
    * moments accumulate in INTEGER hundredth units (values ×100, their
    * squares in hundredth²) as DECIMAL(38,0) — so the Δs, their k-term
    * sum, and the closing subtraction are all exact integers, and the
    * two doubles fed to the final division are conversions of THE SAME
    * integers in both engines (DuckDB replays in HUGEINT). One corpus
    * scan, one grouped aggregate; rows with any null item are dropped
    * (listwise, the classical convention). Output: key, n, alpha (null
    * when n < 2 or var_total = 0). */
  def cronbachAlpha(df: DataFrame, keyCol: String,
      itemCols: Seq[String]): DataFrame = {
    require(itemCols.size >= 2, "cronbachAlpha needs >= 2 item columns")
    val k = itemCols.size
    def cents(c: Column) = (d(c) * 100).cast("long")
    val rowSum = itemCols.map(c => cents(col(c))).reduce(_ + _)
    val aggCols = itemCols.flatMap { c =>
      Seq(sum(i38(cents(col(c)))).as(s"sx_$c"),
        sum(i38(cents(col(c))) * i38(cents(col(c)))).as(s"sxx_$c"))
    } ++ Seq(count(lit(1)).as("n"),
      sum(i38(rowSum)).as("sx_tot"),
      sum(i38(rowSum) * i38(rowSum)).as("sxx_tot"))
    val agg = df.na.drop(itemCols).groupBy(col(keyCol))
      .agg(aggCols.head, aggCols.tail: _*)
    // Δ = n·Σx² − (Σx)² in hundredth² units — exact integers; the
    // k-term Σ_i Δ_i is a literal fold over one aggregate row.
    def delta(sx: Column, sxx: Column) = i38(col("n")) * sxx - sx * sx
    val sumDelta = itemCols
      .map(c => delta(col(s"sx_$c"), col(s"sxx_$c")))
      .reduce(_ + _)
    val totDelta = delta(col("sx_tot"), col("sxx_tot"))
    val alpha = lit(k.toDouble) / lit(k.toDouble - 1.0) *
      ((totDelta - sumDelta).cast("double") / totDelta.cast("double"))
    agg.select(col(keyCol), col("n"),
      when(col("n") >= 2 && totDelta > 0, alpha).as("alpha"))
  }

  /** Friedman test (Friedman 1937): within-subject rank ANOVA — did
    * any of k matched treatments shift the CONTINUOUS outcome, with
    * every subject serving as its own block? The rank companion of
    * [[cochranQ]] (binary) and the blocked companion of
    * [[kruskalWallisByKey]] (independent groups).
    *
    * Blocks: one cell per (subject, treatment) — duplicate rows
    * collapse by exact decimal SUM; subjects missing any treatment are
    * dropped (complete-block design), their count surfaced. Doubled
    * mid-ranks within each block come from the rank identity
    * 2·mid = rank_asc + (k+1) − rank_desc (both min-rank — the
    * [[Stats.spearmanByKey]] trick), so the per-treatment rank totals
    * R2_j and Σ_j R2_j² are exact integers; blocks are balanced by
    * construction, so no per-group division is needed anywhere.
    * χ²_F = 12/(n·k·(k+1)) · Σ R_j² − 3n(k+1), tie-corrected by
    * C = 1 − Σ(t³−t)/(n·k·(k²−1)).
    *
    * Work: one corpus groupBy to the (subject, treatment) cells, two
    * subject-keyed window ranks over ONE exchange, a treatment
    * aggregate, one final row. Output: n_subjects, n_excluded, k,
    * chi2, chi2_adj (null when k < 2, n = 0, or all ranks tie). */
  def friedman(df: DataFrame, subjectCol: String, treatmentCol: String,
      valueCol: String,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the cell table feeds the k probe, the exclusion count, and the
    // rank pass — retained so the corpus is scanned once
    val cells = scope.retain(df
      .filter(col(subjectCol).isNotNull && col(treatmentCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(subjectCol).as("subj"), col(treatmentCol).as("trt"))
      .agg(sum(d(col(valueCol))).as("v")))
    // bounded driver scalars by contract: k = |treatments| (small by
    // the design's definition), plus the pre-exclusion subject count
    val k = cells.select(col("trt")).distinct().count()
    val perSubj = Window.partitionBy(col("subj"))
    val complete = cells
      .withColumn("__kc", count(lit(1)).over(perSubj))
      .filter(col("__kc") === k)
    val excluded = cells.select(col("subj")).distinct().count()
    val wAsc = perSubj.orderBy(col("v").asc)
    val wDesc = perSubj.orderBy(col("v").desc)
    val wTie = Window.partitionBy(col("subj"), col("v"))
    val ranked = complete
      .withColumn("r2",
        rank().over(wAsc) + lit(k + 1) - rank().over(wDesc))
      .withColumn("c", count(lit(1)).over(wTie))
    val perTrt = ranked.groupBy(col("trt"))
      .agg(sum(i38(col("r2"))).as("r2sum"),
        sum((i38(col("c")) * i38(col("c")) - 1)).as("tiep"),
        count(lit(1)).as("n"))
    val fin = perTrt.agg(
      count(lit(1)).as("k"),
      max(col("n")).cast("long").as("n_subjects"),
      sum(i38(col("r2sum")) * i38(col("r2sum"))).as("r2sq"),
      sum(col("tiep")).as("ties"))
    val nD = col("n_subjects").cast("double")
    val kD = col("k").cast("double")
    // Σ R_j² = Σ (R2_j/2)² = r2sq / 4
    val chi2 = lit(12.0) * (col("r2sq").cast("double") / lit(4.0)) /
      (nD * kD * (kD + lit(1.0))) -
      lit(3.0) * nD * (kD + lit(1.0))
    val corr = lit(1.0) - col("ties").cast("double") /
      (nD * kD * (kD * kD - lit(1.0)))
    val ok = col("k") >= 2 && col("n_subjects") > 0
    fin.select(col("n_subjects"),
      (lit(excluded) - col("n_subjects")).cast("long").as("n_excluded"),
      col("k"),
      when(ok, chi2).as("chi2"),
      when(ok && corr > 0.0, chi2 / corr).as("chi2_adj"))
  }

  /** Cochran-Armitage trend test (Armitage 1955): does a BINARY
    * outcome rate rise or fall monotonically with an ORDERED exposure
    * score? The dose-response companion of [[Stats.chiSquareCells]]
    * (which sees association but not direction/order). Scores enter as
    * exact hundredth-unit integers; z is scale-invariant in the score,
    * so the quantization unit cancels.
    *
    * z = (Σsy − Σs·R/N) / sqrt(R/N · (1 − R/N) · (Σs² − (Σs)²/N))
    * over exact integer moments (Σsy, Σs, Σs², R, N) from ONE corpus
    * aggregate — no grouping, no window, no join; the closing formula
    * is fixed-shape doubles. `outcomeCol` must be 0/1. Output one row:
    * n, r, z (null when the outcome or the score is constant). */
  def cochranArmitage(df: DataFrame, scoreCol: String,
      outcomeCol: String): DataFrame = {
    val s = (d(col(scoreCol)) * 100).cast("long")
    val y = col(outcomeCol).cast("long")
    val agg = df
      .filter(col(scoreCol).isNotNull && col(outcomeCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(y).cast("long").as("r"),
        sum(i38(s) * y).as("ssy"),
        sum(i38(s)).as("ss"),
        sum(i38(s) * i38(s)).as("sss"))
    val nD = col("n").cast("double")
    val rD = col("r").cast("double")
    val p = rD / nD
    val t = col("ssy").cast("double") - col("ss").cast("double") * rD / nD
    val v = p * (lit(1.0) - p) *
      (col("sss").cast("double") -
        col("ss").cast("double") * col("ss").cast("double") / nD)
    agg.select(col("n"), col("r"),
      when(col("r") > 0 && col("r") < col("n") && v > 0.0,
        t / sqrt(v)).as("z"))
  }

  /** One-way random-effects intraclass correlation ICC(1,1) (Shrout &
    * Fleiss 1979; unbalanced groups per Searle): how much of the
    * value's variance lives BETWEEN groups? The variance-decomposition
    * readout behind "is this column keyed by that one" QA probes.
    *
    * ANOVA identities over micro-unit integers (DECIMAL(18,2)·100):
    * MSB = (Σ_g S_g²/n_g − T²/N)/(J−1), MSW = (ΣX² − Σ_g S_g²/n_g)/
    * (N−J), n₀ = (N − Σn_g²/N)/(J−1), ICC = (MSB−MSW)/(MSB+(n₀−1)MSW).
    * The cross-group Σ S_g²/n_g quantizes per group with one micro
    * integral division (order-independent integer sum — the
    * [[kruskalWallisByKey]] discipline). MSB/MSW are reported in
    * squared VALUE units (the ×100 hundredth-unit quantization squares
    * to 1e4, divided back in the fixed-shape formulas); ICC is
    * scale-free.
    *
    * Work: one corpus groupBy to the per-group moments, one global
    * aggregate. Output one row: n, j, msb, msw, icc (null when J < 2
    * or N ≤ J or the denominator is 0). */
  def iccOneWay(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val fin = groupMomentRow(df, groupCol, valueCol)
    val nD = col("n").cast("double")
    val jD = col("j").cast("double")
    val aD = col("a_micro").cast("double") / lit(1000000.0)
    val tD = col("t_sum").cast("double")
    // hundredth-units → value units: values entered at ×100, so the
    // squared-scale mean squares divide by 100² = 1e4. ICC is a ratio —
    // scaling cancels there.
    val msb = (aD - tD * tD / nD) / (jD - lit(1.0)) / lit(1.0e4)
    val msw = (col("q_sum").cast("double") - aD) / (nD - jD) / lit(1.0e4)
    val n0 = (nD - col("n2_sum").cast("double") / nD) / (jD - lit(1.0))
    val den = msb + (n0 - lit(1.0)) * msw
    val ok = col("j") >= 2 && col("n") > col("j")
    fin.select(col("n"), col("j"),
      when(ok, msb).as("msb"), when(ok, msw).as("msw"),
      when(ok && den > 0.0, (msb - msw) / den).as("icc"))
  }

  /** One-way ANOVA F test: does the value's MEAN differ across groups?
    * The parametric companion of [[kruskalWallisByKey]] (which tests
    * rank distributions) and the F half of [[iccOneWay]]'s variance
    * decomposition — same one-row micro-unit moment engine
    * ([[groupMomentRow]]), so the two readouts are guaranteed
    * consistent. Output one row: n, j, df1 (= j−1), df2 (= n−j), msb,
    * msw, f (null when j < 2, n ≤ j, or MSW = 0). */
  def oneWayAnovaF(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val fin = groupMomentRow(df, groupCol, valueCol)
    val nD = col("n").cast("double")
    val jD = col("j").cast("double")
    val aD = col("a_micro").cast("double") / lit(1000000.0)
    val tD = col("t_sum").cast("double")
    val msb = (aD - tD * tD / nD) / (jD - lit(1.0)) / lit(1.0e4)
    val msw = (col("q_sum").cast("double") - aD) / (nD - jD) / lit(1.0e4)
    val ok = col("j") >= 2 && col("n") > col("j")
    fin.select(col("n"), col("j"),
      (col("j") - 1).cast("long").as("df1"),
      (col("n") - col("j")).cast("long").as("df2"),
      when(ok, msb).as("msb"), when(ok, msw).as("msw"),
      when(ok && msw > 0.0, msb / msw).as("f"))
  }

  /** Two-way ANOVA F statistics over the factors (aCol, bCol): the
    * main-effect and interaction readout ("does the event type's value
    * level differ, does the week differ, and does the type×week
    * pattern shift?"). Sums of squares come from the per-cell count
    * table via the same exact machinery as [[oneWayAnovaF]]: every
    * Σ S²/n term is an integral micro division (order-independent
    * DECIMAL sums), SS_AB = SS_cells − SS_A − SS_B and
    * SS_E = SS_tot − SS_cells by exact integer subtraction, and only
    * the closing F ratios are doubles (through the 2^53 hi/lo split).
    *
    * The decomposition is the classical unadjusted one — exact for
    * balanced designs; on unbalanced data the main effects are the
    * marginal (unweighted-by-other-factor) sums, the standard
    * sequential reading. Interaction df uses the OBSERVED cell count:
    * df_ab = cells − a − b + 1, df_e = n − cells.
    *
    * Output one row: n, a_levels, b_levels, n_cells, f_a, f_b, f_ab
    * (each null when its df ≤ 0 or MS_E ≤ 0). */
  def twoWayAnova(df: DataFrame, aCol: String, bCol: String,
      valueCol: String,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    val base = df
      .filter(col(valueCol).isNotNull && col(aCol).isNotNull &&
        col(bCol).isNotNull)
      .select(col(aCol).as("__a"), col(bCol).as("__b"),
        (d(col(valueCol)) * 100).cast("long").as("vm"))
    // ONE corpus pass to the bounded cell table; the three margin
    // reductions below all read it from cache
    val cells = scope.retain(base.groupBy(col("__a"), col("__b")).agg(
      count(lit(1)).as("n_ab"),
      sum(i38(col("vm"))).as("s_ab"),
      sum(i38(col("vm")) * col("vm")).as("q_ab")))
    def sqTerm(s: Column, n: Column) =
      microDiv(lit(1000000).cast("decimal(38,0)") * s * s, i38(n))
    val cellAgg = cells.agg(
      sum(col("n_ab")).cast("long").as("n"),
      count(lit(1)).as("n_cells"),
      sum(col("s_ab")).as("s"),
      sum(col("q_ab")).as("q"),
      sum(sqTerm(col("s_ab"), col("n_ab"))).as("t_cells"))
    val margA = cells.groupBy(col("__a"))
      .agg(sum(col("s_ab")).as("s_a"), sum(col("n_ab")).as("n_a"))
      .agg(count(lit(1)).as("a_levels"),
        sum(sqTerm(col("s_a"), col("n_a"))).as("t_a"))
    val margB = cells.groupBy(col("__b"))
      .agg(sum(col("s_ab")).as("s_b"), sum(col("n_ab")).as("n_b"))
      .agg(count(lit(1)).as("b_levels"),
        sum(sqTerm(col("s_b"), col("n_b"))).as("t_b"))
    val agg = cellAgg.crossJoin(broadcast(margA))
      .crossJoin(broadcast(margB))
    def dvp(c: Column) = LinearModel.intMomentToDouble(c, 1.0e6)
    def dv1(c: Column) = LinearModel.intMomentToDouble(c, 1.0)
    val t2 = microDiv(lit(1000000).cast("decimal(38,0)") *
      col("s") * col("s"), i38(col("n")))
    val ssA = dvp(col("t_a")) - dvp(t2)
    val ssB = dvp(col("t_b")) - dvp(t2)
    val ssCells = dvp(col("t_cells")) - dvp(t2)
    val ssTot = dv1(col("q")) - dvp(t2)
    val ssAb = ssCells - ssA - ssB
    val ssE = ssTot - ssCells
    val nD = col("n").cast("double")
    val aD = col("a_levels").cast("double")
    val bD = col("b_levels").cast("double")
    val cD = col("n_cells").cast("double")
    val dfA = aD - lit(1.0)
    val dfB = bD - lit(1.0)
    val dfAb = cD - aD - bD + lit(1.0)
    val dfE = nD - cD
    val msE = ssE / dfE
    def f(ss: Column, dfx: Column) =
      when(dfx > 0.0 && dfE > 0.0 && msE > 0.0, (ss / dfx) / msE)
    agg.select(col("n"), col("a_levels"), col("b_levels"),
      col("n_cells"),
      f(ssA, dfA).as("f_a"), f(ssB, dfB).as("f_b"),
      f(ssAb, dfAb).as("f_ab"))
  }

  /** The shared one-row group-moment engine behind [[iccOneWay]] and
    * [[oneWayAnovaF]]: per-group micro-unit sums, the order-independent
    * Σ S_g²/n_g micro division, and the group-size moments. */
  private def groupMomentRow(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol), (d(col(valueCol)) * 100).cast("long").as("vm"))
    val perG = base.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_g"),
      sum(i38(col("vm"))).as("s"),
      sum(i38(col("vm")) * i38(col("vm"))).as("q"))
    val term = microDiv(lit(1000000).cast("decimal(38,0)") *
      col("s") * col("s"), col("n_g"))
    perG.agg(
      count(lit(1)).as("j"),
      sum(col("n_g")).cast("long").as("n"),
      sum(term).as("a_micro"),
      sum(col("s")).as("t_sum"),
      sum(col("q")).as("q_sum"),
      sum(i38(col("n_g")) * i38(col("n_g"))).as("n2_sum"))
  }
}
