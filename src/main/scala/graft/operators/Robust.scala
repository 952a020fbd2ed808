package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median absolute deviation (MAD).
  *
  * The z-score detector (`Anomaly`) is mean/stddev-based and melts in the
  * presence of the very outliers it hunts; the MAD estimator has a 50%
  * breakdown point. Per group: `med = median(x)`,
  * `mad = median(|x - med|)`, flag rows with `|x - med| > k * mad`
  * (k ≈ 3 under the usual 1.4826 normal-consistency folding, which the
  * caller bakes into k — no magic constants here).
  *
  * Both medians are EXACT rank-select quantiles (`Quantiles
  * .exactQuantiles`, value at rank `ceil(n/2)`, deterministic tiebreak) —
  * not interpolated — so the whole report is engine-reproducible: rank
  * select is integer, `abs(x - med)` and `k * mad` are single
  * correctly-rounded IEEE ops, and the comparison is exact. Cost: two
  * per-group sort-shuffles (one per median — the second sorts a column
  * derived from the first, so it cannot be shared) plus broadcast-shaped
  * joins of the per-group scalars back to the rows. Group cardinality
  * bounds the join sides, not the corpus.
  */
object Robust {

  /** Returns df + (med, mad, absdev, is_outlier). */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
      tieCol: String, k: Double): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
    val med = Quantiles
      .exactQuantiles(rows, valueCol, tieCol, Seq(keyCol), Seq(0.5))
      .select(col(keyCol), col("q").as("med"))
    val withMed = rows.join(med, keyCol)
      .withColumn("absdev", abs(col(valueCol) - col("med")))
    val mad = Quantiles
      .exactQuantiles(withMed, "absdev", tieCol, Seq(keyCol), Seq(0.5))
      .select(col(keyCol), col("q").as("mad"))
    withMed.join(mad, keyCol)
      .withColumn("is_outlier", col("absdev") > lit(k) * col("mad"))
  }

  /** Per-key weighted median: the smallest value v (ties broken by
    * `tieCol`) whose running weight reaches half the key's total —
    * `2·W_≤v ≥ W_total`, the lower weighted median. Weights go through
    * decimal(18,2) so both window sums are exact and the comparison is
    * engine-reproducible; rows with null/non-positive weight or null
    * value are excluded. One per-key sort-shuffle (both window frames
    * share it), then a min aggregation over the qualifying suffix.
    * Output: key, wmedian. */
  def weightedMedian(df: DataFrame, keyCol: String, valueCol: String,
      weightCol: String, tieCol: String): DataFrame = {
    val dw = col(weightCol).cast("decimal(18,2)")
    val sortW = Window.partitionBy(col(keyCol))
      .orderBy(col(valueCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.partitionBy(col(keyCol))
    df.filter(col(valueCol).isNotNull && dw > 0)
      .withColumn("__runw", sum(dw).over(sortW))
      .withColumn("__totw", sum(dw).over(allW))
      .filter(col("__runw") * 2 >= col("__totw"))
      .groupBy(col(keyCol))
      .agg(min(col(valueCol)).as("wmedian"))
  }

  /** Per-key Kendall tau-b (Kendall 1945): rank correlation by pair
    * concordance, the robust companion to `Stats.spearmanByKey` —
    * insensitive to monotone transforms AND to the magnitude of rank
    * gaps, with the -b tie correction in both margins.
    *
    * τ_b = (n_c − n_d) / √((n₀ − t_x)(n₀ − t_y)) where n₀ = n(n−1)/2,
    * n_c / n_d count concordant / discordant pairs, and t_x / t_y are
    * the tied-pair counts per margin. All counts are exact integers
    * (pair flags are strict-inequality comparisons — no arithmetic on
    * the values at all, so mixed int/double columns are safe); τ_b is
    * one fixed-shape double expression over them.
    *
    * SCALE CONTRACT — the pair table is an equi-join on the key with
    * an `idCol` total order (`id₁ < id₂`), i.e. Θ(Σ_k n_k²) pairs: the
    * exact statistic is inherently quadratic in GROUP size (there is
    * no distributed O(n log n) merge form), so this operator is for
    * BOUNDED groups — panels, strata, per-segment samples (the
    * `FuzzyJoin` all-pairs precedent). For corpus-sized keys, sample
    * each key upstream (e.g. `Sampling.hashBucket(id, B) = 0`) — τ is
    * a U-statistic, so a uniform pair subsample estimates it unbiased.
    * Tie counts t_x / t_y come from per-value groupBys, NOT pairs.
    *
    * Output: key, n, nc, nd, tx, ty, tau_b (null when either margin is
    * fully tied). */
  def kendallByKey(df: DataFrame, keyCol: String, idCol: String,
      xCol: String, yCol: String): DataFrame = {
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(keyCol), col(idCol), col(xCol), col(yCol))
    val a = base.select(col(keyCol), col(idCol).as("__i1"),
      col(xCol).as("__x1"), col(yCol).as("__y1"))
    val b = base.select(col(keyCol), col(idCol).as("__i2"),
      col(xCol).as("__x2"), col(yCol).as("__y2"))
    val pairs = a.join(b, Seq(keyCol)).filter(col("__i1") < col("__i2"))
    val conc = (col("__x1") < col("__x2") && col("__y1") < col("__y2")) ||
      (col("__x1") > col("__x2") && col("__y1") > col("__y2"))
    val disc = (col("__x1") < col("__x2") && col("__y1") > col("__y2")) ||
      (col("__x1") > col("__x2") && col("__y1") < col("__y2"))
    val cd = pairs.groupBy(col(keyCol)).agg(
      count_if(conc).as("nc"), count_if(disc).as("nd"))
    def tiePairs(c: String, out: String) = base
      .groupBy(col(keyCol), col(c)).agg(count(lit(1)).as("__g"))
      .groupBy(col(keyCol))
      .agg(sum(expr("(__g * (__g - 1)) div 2")).as(out))
    val nK = base.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val joined = nK
      .join(cd, Seq(keyCol), "left")
      .join(tiePairs(xCol, "tx"), Seq(keyCol), "left")
      .join(tiePairs(yCol, "ty"), Seq(keyCol), "left")
      .na.fill(0L, Seq("nc", "nd"))
    val n0 = (col("n") * (col("n") - 1) / 2).cast("double")
    val dx = n0 - col("tx").cast("double")
    val dy = n0 - col("ty").cast("double")
    joined.select(col(keyCol), col("n"), col("nc"), col("nd"),
      col("tx"), col("ty"),
      when(dx > 0.0 && dy > 0.0,
        (col("nc") - col("nd")).cast("double") / (sqrt(dx) * sqrt(dy)))
        .as("tau_b"))
  }

  /** The 100 TB path for [[kendallByKey]]: the documented U-statistic
    * subsample escape hatch as CODE. τ_b is a U-statistic, so computing
    * it exactly over a uniform row subsample of each key estimates the
    * full-key τ_b unbiased — and turns the Θ(n_k²) pair join into
    * Θ((rate·n_k)²), a 10⁴× pair reduction at rate 0.01.
    *
    * The subsample is [[Sampling.hashSample]] on `idCol` — per-ROW
    * md5-bucket decisions, so the selection is deterministic across
    * runs, partitionings, and engines (a SQL oracle replays it exactly;
    * `df.sample`'s per-partition RNG could not). Everything downstream
    * is [[kendallByKey]] verbatim: exact integer pair counts over the
    * SAMPLED rows, one fixed-shape double.
    *
    * Output: key, n_full (pre-sample row count — the estimate's
    * population), n, n_pairs (= n(n−1)/2, the pair count the estimate
    * actually used), nc, nd, tx, ty, tau_b. Keys whose rows are all
    * sampled away keep their n_full row with n = 0 and null tau_b
    * (surface, don't drop). */
  def kendallSampledByKey(df: DataFrame, keyCol: String, idCol: String,
      xCol: String, yCol: String, rate: Double,
      buckets: Int = 10000): DataFrame = {
    require(rate > 0.0 && rate <= 1.0, s"rate must be in (0, 1], got $rate")
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(idCol).isNotNull)
    val nFull = base.groupBy(col(keyCol)).agg(count(lit(1)).as("n_full"))
    val sampled = base.filter(Sampling.hashSample(col(idCol), rate, buckets))
    val ns = coalesce(col("n"), lit(0L))
    nFull.join(kendallByKey(sampled, keyCol, idCol, xCol, yCol),
        Seq(keyCol), "left")
      .select(col(keyCol), col("n_full"),
        ns.as("n"),
        // n(n−1) is even; shiftright is the exact integral halving
        shiftright(ns * (ns - lit(1L)), 1).as("n_pairs"),
        coalesce(col("nc"), lit(0L)).as("nc"),
        coalesce(col("nd"), lit(0L)).as("nd"),
        coalesce(col("tx"), lit(0L)).as("tx"),
        coalesce(col("ty"), lit(0L)).as("ty"),
        col("tau_b"))
  }

  /** Per-key trimmed mean: the mean of the values BETWEEN the lower and
    * upper `trimFrac` quantile ranks — the robust location estimate
    * between the median (50% trim) and the mean (0%), standard for
    * metric aggregation under heavy tails (latencies, spend).
    *
    * ENGINE-EXACT: ranks come from one per-key sort (ties broken by
    * `tieCol` — deterministic), the cut k = floor(n·trimFrac) is the
    * same correctly-rounded double floor in both engines, the kept
    * values sum as DECIMAL(18,2) (order-independent), and the mean is
    * one fixed-shape double division.
    *
    * SCALE CONTRACT (the `Quantiles.exactQuantiles` family): the rank
    * window sorts each key in ONE task — fine for many modest keys,
    * a single-task corpus sort when keys are few and huge. At that
    * shape, take the cut points from `Quantiles` sketch quantiles
    * (KLL) instead and trim with a plain conditional aggregate —
    * approximate cuts, exact mean, no per-key sort.
    *
    * Output: key, n, n_kept, trimmed_mean (null when the trim empties
    * the key). */
  def trimmedMeanByKey(df: DataFrame, keyCol: String, valueCol: String,
      tieCol: String, trimFrac: Double): DataFrame = {
    require(trimFrac >= 0.0 && trimFrac < 0.5,
      s"trimFrac must be in [0, 0.5), got $trimFrac")
    val wS = Window.partitionBy(col(keyCol))
      .orderBy(col(valueCol), col(tieCol))
    val wAll = Window.partitionBy(col(keyCol))
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(wS).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__k",
        floor(col("__n").cast("double") * lit(trimFrac)).cast("long"))
    ranked
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"),
        count_if(col("__rn") > col("__k") &&
          col("__rn") <= col("__n") - col("__k")).as("n_kept"),
        sum(when(col("__rn") > col("__k") &&
            col("__rn") <= col("__n") - col("__k"),
          col(valueCol).cast("decimal(18,2)"))).as("__s"))
      .select(col(keyCol), col("n"), col("n_kept"),
        when(col("n_kept") > 0,
          col("__s").cast("double") / col("n_kept").cast("double"))
          .as("trimmed_mean"))
  }

  /** Per-key weighted mean with Kish's effective sample size (Kish
    * 1965): ESS = (Σw)²/Σw² — the "how many equal-weight samples is
    * this weighted estimate actually worth" number read next to every
    * importance-weighted metric (DSIR weights, inverse-propensity
    * scores, quality-weighted sampling): heavy weight concentration
    * drives ESS toward 1 no matter how many rows went in.
    *
    * ENGINE-EXACT: Σw, Σw², Σwx accumulate as DECIMAL(18,2) products
    * (order-independent); the mean and ESS are fixed-shape double
    * divisions. Rows with null/non-positive weight or null value are
    * excluded. One aggregation pass, no window, no join. Output: key,
    * n, wmean, ess (null mean/ess when the key has no mass). */
  def weightedMeanEss(df: DataFrame, keyCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val dw = col(weightCol).cast("decimal(18,2)")
    val dv = col(valueCol).cast("decimal(18,2)")
    val agg = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .groupBy(col(keyCol)).agg(
        count(lit(1)).as("n"),
        sum(dw).as("sw"), sum(dw * dw).as("sww"),
        sum(dw * dv).as("swx"))
    val sw = col("sw").cast("double")
    val sww = col("sww").cast("double")
    val swx = col("swx").cast("double")
    agg.select(col(keyCol), col("n"),
      when(sw > 0.0, swx / sw).as("wmean"),
      when(sww > 0.0, sw * sw / sww).as("ess"))
  }

  /** The 100 TB path for [[trimmedMeanByKey]]: cut points from ONE
    * sketch aggregation (`percentile_approx` — mergeable, map-side
    * combined, no per-key sort anywhere), then the mean of values
    * inside [lo, hi] as a second conditional decimal aggregate. Two
    * shuffle-light passes regardless of key cardinality or skew —
    * exactly the shape the exact form's single-task-per-key window
    * cannot deliver when keys are few and huge.
    *
    * The CUTS are approximate (rank error ~1/accuracy), the MEAN over
    * the kept band is decimal-exact; values equal to a cut are kept on
    * both ends (closed interval — the sketch returns data values, so
    * boundary ties keep whole tie-groups, the winsorize convention).
    * Not oracle-comparable (sketch internals are engine-specific); the
    * spec pins it against [[trimmedMeanByKey]] on clean data instead.
    * Output: key, n, n_kept, trimmed_mean. */
  def trimmedMeanSketch(df: DataFrame, keyCol: String, valueCol: String,
      trimFrac: Double, accuracy: Int = 10000): DataFrame = {
    require(trimFrac >= 0.0 && trimFrac < 0.5,
      s"trimFrac must be in [0, 0.5), got $trimFrac")
    val cuts = Quantiles.approxQuantiles(
        df.filter(col(valueCol).isNotNull), valueCol, Seq(keyCol),
        Seq(trimFrac, 1.0 - trimFrac), accuracy)
      .select(col(keyCol), col("qs").getItem(0).as("__lo"),
        col("qs").getItem(1).as("__hi"))
    df.filter(col(valueCol).isNotNull)
      .join(cuts, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        count_if(col(valueCol) >= col("__lo") &&
          col(valueCol) <= col("__hi")).as("n_kept"),
        sum(when(col(valueCol) >= col("__lo") &&
            col(valueCol) <= col("__hi"),
          col(valueCol).cast("decimal(18,2)"))).as("__s"))
      .select(col(keyCol), col("n"), col("n_kept"),
        when(col("n_kept") > 0,
          col("__s").cast("double") / col("n_kept").cast("double"))
          .as("trimmed_mean"))
  }

  /** Dispatcher between [[trimmedMeanByKey]] (exact, one-task-per-key
    * sort window) and [[trimmedMeanSketch]] (KLL cuts, no per-key sort)
    * by the shape that actually breaks the exact form: the LARGEST
    * key's row count. Below `maxExactKeyRows` every per-key sort fits
    * one task comfortably and the exact form is both faster and
    * oracle-comparable; above it, a single huge key degenerates the
    * rank window into one straggler task sorting a corpus, and the
    * sketch path's two shuffle-light aggregation passes are the only
    * shape that survives 100× (the scale contract in both scaladocs,
    * now enforced in code instead of left to the caller).
    *
    * The probe is ONE count aggregation (map-side combined, node-sized
    * result, single-row collect) — noise next to either path. Returns
    * (result, pathName) with pathName ∈ {"exact", "sketch"} so callers
    * and specs can pin the decision; [[trimmedMeanAuto]] is the
    * plain-DataFrame form. */
  def trimmedMeanAutoWithPath(df: DataFrame, keyCol: String,
      valueCol: String, tieCol: String, trimFrac: Double,
      maxExactKeyRows: Long = 2000000L, accuracy: Int = 10000)
      : (DataFrame, String) = {
    require(maxExactKeyRows > 0, s"maxExactKeyRows must be > 0")
    val biggest = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__mx")).collect()
    val maxKey = if (biggest.isEmpty || biggest(0).isNullAt(0)) 0L
      else biggest(0).getLong(0)
    if (maxKey > maxExactKeyRows)
      (trimmedMeanSketch(df, keyCol, valueCol, trimFrac, accuracy),
        "sketch")
    else (trimmedMeanByKey(df, keyCol, valueCol, tieCol, trimFrac),
      "exact")
  }

  /** [[trimmedMeanAutoWithPath]] without the path tag. */
  def trimmedMeanAuto(df: DataFrame, keyCol: String, valueCol: String,
      tieCol: String, trimFrac: Double,
      maxExactKeyRows: Long = 2000000L, accuracy: Int = 10000): DataFrame =
    trimmedMeanAutoWithPath(df, keyCol, valueCol, tieCol, trimFrac,
      maxExactKeyRows, accuracy)._1

  /** Per-key Theil–Sen robust slope (Theil 1950, Sen 1968): the median
    * of all pairwise slopes (y₂−y₁)/(x₂−x₁), with the intercept as the
    * median residual y − slope·x — the regression line a 29%-outlier
    * contamination cannot move, vs OLS's zero breakdown
    * (`Stats.trendByKey` is the efficient-but-fragile sibling).
    *
    * ENGINE-EXACT by SELECTION: every slope is one IEEE
    * subtract/subtract/divide (correctly rounded, deterministic); the
    * median is a rank-select — row `(m+1) div 2` of the (slope, id₁,
    * id₂) sort, the LOWER median, no averaging — and the intercept is
    * the same rank-select over per-point residuals computed from that
    * slope. Nothing is ever summed, so there is no reduction-order
    * hazard anywhere and a SQL oracle replays the result bit-for-bit.
    *
    * SCALE CONTRACT: same Θ(Σ n_k²) pair join as [[kendallByKey]] —
    * bounded groups (panels/strata); subsample big keys upstream (the
    * pairwise-slope median over a uniform subsample is the standard
    * scalable estimator). Vertical pairs (x₁ = x₂) contribute no
    * slope, per the definition.
    *
    * Output: key, n, n_pairs, slope, intercept (nulls when every pair
    * is vertical). */
  def theilSenByKey(df: DataFrame, keyCol: String, idCol: String,
      xCol: String, yCol: String): DataFrame = {
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(keyCol), col(idCol), col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
    val a = base.select(col(keyCol), col(idCol).as("__i1"),
      col("__x").as("__x1"), col("__y").as("__y1"))
    val b = base.select(col(keyCol), col(idCol).as("__i2"),
      col("__x").as("__x2"), col("__y").as("__y2"))
    val slopes = a.join(b, Seq(keyCol))
      .filter(col("__i1") < col("__i2") && col("__x1") =!= col("__x2"))
      .select(col(keyCol),
        ((col("__y2") - col("__y1")) / (col("__x2") - col("__x1")))
          .as("__s"), col("__i1"), col("__i2"))
    val wS = Window.partitionBy(col(keyCol))
      .orderBy(col("__s"), col("__i1"), col("__i2"))
    val wAll = Window.partitionBy(col(keyCol))
    val med = slopes
      .withColumn("__rn", row_number().over(wS))
      .withColumn("__m", count(lit(1)).over(wAll))
      .filter(col("__rn") === expr("(__m + 1) div 2"))
      .select(col(keyCol), col("__m").as("n_pairs"), col("__s").as("slope"))
    val resid = base.join(med, Seq(keyCol))
      .select(col(keyCol), col("n_pairs"), col("slope"), col(idCol),
        (col("__y") - col("slope") * col("__x")).as("__r"))
    val wR = Window.partitionBy(col(keyCol))
      .orderBy(col("__r"), col(idCol))
    val wRAll = Window.partitionBy(col(keyCol))
    val inter = resid
      .withColumn("__rn", row_number().over(wR))
      .withColumn("__k", count(lit(1)).over(wRAll))
      .filter(col("__rn") === expr("(__k + 1) div 2"))
      .select(col(keyCol), col("n_pairs"), col("slope"),
        col("__r").as("intercept"))
    base.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .join(inter, Seq(keyCol), "left")
      .select(col(keyCol), col("n"), coalesce(col("n_pairs"), lit(0L))
        .as("n_pairs"), col("slope"), col("intercept"))
  }
}
