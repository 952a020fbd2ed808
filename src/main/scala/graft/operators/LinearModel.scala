package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear-model fitting by normal equations — the distributed half is
  * ONE map-side-combined aggregate collecting the (d+1)×(d+1) moment
  * matrix in exact DECIMAL; the solve is a handful of scalar ops on
  * that single row. No gradient loop, no per-iteration shuffle: at
  * 100 TB a quality-classifier or calibration fit is one corpus pass
  * regardless of iteration budget, because the sufficient statistics
  * (Σx_ix_j, Σx_iy) are all a linear least-squares fit ever needs.
  *
  * Engine-exactness follows the [[Stats]] contract: partials are
  * DECIMAL(18,2) products summed exactly (order-independent under any
  * shuffle), and the solve is a FIXED-SHAPE double expression — Cramer's
  * rule for the 2-feature form — so two engines evaluating the same
  * tree agree bit-for-bit. The general-d driver solve trades that for
  * generality (Gaussian elimination is reduction-ordered) and is
  * spec-checked against the closed form instead.
  *
  * Reference anchor: fastETL ships data TO a warehouse for modelling
  * (fastetl/custom_functions/fast_etl.py copy pipelines); this family is
  * the in-engine counterpart a training-data pipeline needs — fit the
  * quality/calibration model where the corpus lives instead of round-
  * tripping it.
  */
object LinearModel {

  private def d(c: Column) = c.cast("decimal(18,2)")

  /** Per-key ridge fit of y on (x1, x2) with intercept, exact moment
    * pass + Cramer-rule double solve. `lambda2` is the L2 penalty added
    * to the non-intercept diagonal (0.0 = OLS). Rows with any null are
    * dropped (pairwise-complete would break the shared moment matrix).
    *
    * Output per key: n, b0, b1, b2, r2 — coefficients null when the
    * (ridge-regularised) normal matrix is singular (|det| == 0, e.g. a
    * constant feature under OLS). r2 is the PENALISED fit's plain R²
    * (can be negative for large lambda; null when y is constant).
    *
    * Scale shape: one scan, one keyed exchange (the groupBy), ten
    * decimal partials per task before it — the per-key model count can
    * be millions (one model per domain/source) without changing the
    * plan. Pinned in PlanSpec.
    */
  def ridgeByKey(df: DataFrame, keyCol: String, yCol: String,
      x1Col: String, x2Col: String, lambda2: Double): DataFrame = {
    require(lambda2 >= 0.0, s"need lambda2 >= 0, got $lambda2")
    solve2(momentAgg(df, keyCol, yCol, x1Col, x2Col), keyCol, lambda2)
  }

  private val MomentNames =
    Seq("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")

  /** The exact decimal moment pass shared by every 2-feature fit:
    * groupBy `groupCol`, listwise-complete nulls. */
  private def momentAgg(df: DataFrame, groupCol: String, yCol: String,
      x1Col: String, x2Col: String): DataFrame =
    df.filter(col(yCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .groupBy(col(groupCol)).agg(
        count(lit(1)).as("n"),
        sum(d(col(x1Col))).as("s1"),
        sum(d(col(x2Col))).as("s2"),
        sum(d(col(yCol))).as("sy"),
        sum(d(col(x1Col)) * d(col(x1Col))).as("s11"),
        sum(d(col(x1Col)) * d(col(x2Col))).as("s12"),
        sum(d(col(x2Col)) * d(col(x2Col))).as("s22"),
        sum(d(col(x1Col)) * d(col(yCol))).as("s1y"),
        sum(d(col(x2Col)) * d(col(yCol))).as("s2y"),
        sum(d(col(yCol)) * d(col(yCol))).as("syy"))

  /** K-fold cross-validated ridge from ONE corpus pass — the moment
    * trick that makes CV free at 100 TB: the fold-f training moments
    * are (global − fold_f) on the EXACT decimal aggregates, so all k
    * leave-one-fold-out models solve from the same k-row moment table,
    * and the out-of-fold error is the quadratic form
    * syy_f − 2b'v_f + b'M_f b on fold f's own raw moments — no second
    * scan, no per-row prediction pass, no row-order double sums.
    *
    * `foldCol` is the caller's deterministic fold id ([[Splits]] /
    * [[Sampling.hashBucket]] mechanics). Output per fold: n (fold
    * rows), b0/b1/b2 (the model trained WITHOUT this fold), sse_oof,
    * rmse_oof. Coefficients null when the LOFO system is singular.
    * The window totalling the k-row moment table is intentionally
    * unpartitioned — it moves k rows, not the corpus. */
  def cvRidgeByFold(df: DataFrame, foldCol: String, yCol: String,
      x1Col: String, x2Col: String, lambda2: Double): DataFrame = {
    require(lambda2 >= 0.0, s"need lambda2 >= 0, got $lambda2")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val per = momentAgg(df, foldCol, yCol, x1Col, x2Col)
    val withTot = MomentNames.foldLeft(per) { (acc, m) =>
      acc.withColumn(s"g_$m", sum(col(m)).over(w))
    }
    val withLofo = MomentNames.foldLeft(withTot) { (acc, m) =>
      acc.withColumn(s"lofo_$m", col(s"g_$m") - col(m))
    }
    val (det, b0, b1, b2) = cramer2(moments2("lofo_"), lambda2)
    val fold = moments2("")
    val sse = sse2(fold, b0, b1, b2)
    withLofo.select(col(foldCol), col("n"),
      when(det =!= 0.0, b0).as("b0"),
      when(det =!= 0.0, b1).as("b1"),
      when(det =!= 0.0, b2).as("b2"),
      when(det =!= 0.0, sse).as("sse_oof"),
      when(det =!= 0.0,
        sqrt(greatest(sse, lit(0.0)) / fold.n)).as("rmse_oof"))
  }

  /** The ten raw moments of a 2-feature fit as double Columns, read
    * from decimal moment columns under `prefix`. */
  private final case class Moments2(n: Column, s1: Column, s2: Column,
      sy: Column, s11: Column, s12: Column, s22: Column,
      s1y: Column, s2y: Column, syy: Column)

  private def moments2(prefix: String = ""): Moments2 = Moments2(
    col(prefix + "n").cast("double"), col(prefix + "s1").cast("double"),
    col(prefix + "s2").cast("double"), col(prefix + "sy").cast("double"),
    col(prefix + "s11").cast("double"), col(prefix + "s12").cast("double"),
    col(prefix + "s22").cast("double"), col(prefix + "s1y").cast("double"),
    col(prefix + "s2y").cast("double"), col(prefix + "syy").cast("double"))

  /** Engine-neutral big-integer→double with a unit rescale: integer
    * moment sums exceed 2^53, where engines' conversions disagree in
    * the last ulp (DuckDB converts int128 via per-limb floating math;
    * Java/Spark round correctly) — so split m = sign·(hi·2^53 + lo)
    * with EXACT integer ops, reconstruct with a fixed-shape double
    * expression (two IEEE roundings, bit-identical everywhere), then
    * divide by the exact power-of-ten unit. Shared by every
    * integer-quantized fit ([[logisticIrlsGrid]], [[huberIrls]]). */
  private[operators] def intMomentToDouble(c: Column, pow: Double)
      : Column = {
    val p = lit(9007199254740992L) // 2^53
    val a = abs(c)
    val hi = ((a - a % p) / p).cast("double") // quotient well < 2^53
    val lo = (a % p).cast("double") // < 2^53: exact
    (signum(c.cast("double")) *
      (hi * lit(9007199254740992.0) + lo)) / lit(pow)
  }

  private def det3(a: Column, b: Column, c: Column,
      p: Column, q: Column, r: Column,
      x: Column, y: Column, z: Column): Column =
    a * (q * z - r * y) - b * (p * z - r * x) + c * (p * y - q * x)

  /** Cramer's rule on the (ridge-penalised) normal matrix of `m` —
    * fixed-shape double expressions shared by every caller and the SQL
    * oracles (same tree ⇒ same bits). Returns (det, b0, b1, b2).
    * Normal matrix (row-major, intercept first):
    *   [ n   s1        s2      ] [b0]   [sy ]
    *   [ s1  s11+λ     s12     ] [b1] = [s1y]
    *   [ s2  s12       s22+λ   ] [b2]   [s2y]
    */
  private def cramer2(m: Moments2, lambda2: Double)
      : (Column, Column, Column, Column) = {
    import m._
    val p11 = s11 + lit(lambda2)
    val p22 = s22 + lit(lambda2)
    val det = det3(n, s1, s2, s1, p11, s12, s2, s12, p22)
    val det0 = det3(sy, s1, s2, s1y, p11, s12, s2y, s12, p22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, p22)
    val det2 = det3(n, s1, sy, s1, p11, s1y, s2, s12, s2y)
    (det, det0 / det, det1 / det, det2 / det)
  }

  /** Σ(y-ŷ)² of coefficients (b0,b1,b2) against the moments `m` — the
    * expanded quadratic form reads ONLY the moment row, never rows:
    * syy - 2b'v + b'Mb (raw M, no penalty: this is fit error, not the
    * penalised objective). */
  private def sse2(m: Moments2, b0: Column, b1: Column,
      b2: Column): Column = {
    import m._
    syy - lit(2.0) * (b0 * sy + b1 * s1y + b2 * s2y) +
      (b0 * (n * b0 + s1 * b1 + s2 * b2) +
        b1 * (s1 * b0 + s11 * b1 + s12 * b2) +
        b2 * (s2 * b0 + s12 * b1 + s22 * b2))
  }

  private def solve2(agg: DataFrame, keyCol: String,
      lambda2: Double): DataFrame = {
    val m = moments2()
    import m.{n, sy, syy}
    val (det, b0, b1, b2) = cramer2(m, lambda2)
    val sse = sse2(m, b0, b1, b2)
    val sst = syy - sy * sy / n
    agg.select(col(keyCol), col("n"),
      when(det =!= 0.0, b0).as("b0"),
      when(det =!= 0.0, b1).as("b1"),
      when(det =!= 0.0, b2).as("b2"),
      when(det =!= 0.0 && sst > 0.0, lit(1.0) - sse / sst).as("r2"))
  }

  /** General-d ridge fit: one aggregate for the full moment matrix
    * (intercept folded in as x0 = 1), then a DRIVER-SIDE Gaussian
    * elimination with partial pivoting on the (d+1)-sized system — the
    * collect is one row of (d+1)(d+2)/2 + (d+1) decimals, independent
    * of corpus size. Reduction order makes this double solve engine-
    * specific, so it is spec-checked against [[ridgeByKey]]'s closed
    * form rather than oracle-hashed. Returns (coefficients incl.
    * intercept first, n); None when singular. */
  def ridgeFit(df: DataFrame, yCol: String, xCols: Seq[String],
      lambda2: Double): Option[(Seq[Double], Long)] = {
    require(xCols.nonEmpty, "need at least one feature")
    require(lambda2 >= 0.0, s"need lambda2 >= 0, got $lambda2")
    val k = xCols.size + 1 // intercept first
    val xs = lit(1.0).cast("decimal(18,2)") +: xCols.map(c => d(col(c)))
    val clean = df.filter(
      (col(yCol).isNotNull +: xCols.map(col(_).isNotNull)).reduce(_ && _))
    val moments =
      (for (i <- 0 until k; j <- i until k)
        yield sum(xs(i) * xs(j)).as(s"m_${i}_$j")) ++
      (0 until k).map(i => sum(xs(i) * d(col(yCol))).as(s"v_$i")) :+
      count(lit(1)).as("n")
    val rows = clean.agg(moments.head, moments.tail: _*).collect()
    val row = rows.head
    val n = row.getAs[Long]("n")
    if (n == 0) return None
    val a = Array.tabulate(k, k) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      val base = row.getAs[java.math.BigDecimal](s"m_${lo}_$hi").doubleValue
      if (i == j && i > 0) base + lambda2 else base
    }
    val b = Array.tabulate(k)(i =>
      row.getAs[java.math.BigDecimal](s"v_$i").doubleValue)
    solveInPlace(a, b).map(coef => (coef.toSeq, n))
  }

  /** The moment table as PERSISTED, MERGEABLE STATE — ridge joins the
    * sketch-state family (HLL/KLL/MG/theta/CM): sums are associative
    * and commutative, so per-batch moment states fold by plain decimal
    * addition and the model re-solves from state at any time without
    * touching historical rows. State schema is widened to stable
    * decimal(38,·) so repeated merges can't drift precision. */
  def momentState(df: DataFrame, keyCol: String, yCol: String,
      x1Col: String, x2Col: String): DataFrame =
    canonicalize(momentAgg(df, keyCol, yCol, x1Col, x2Col), keyCol)

  /** Fold any union of moment states (stored partitions, a new batch)
    * into one row per key: decimal addition, exact at any merge order. */
  def mergeMomentState(states: DataFrame, keyCol: String): DataFrame =
    canonicalize(
      states.groupBy(col(keyCol)).agg(
        sum(col("n")).as("n"),
        MomentNames.tail.map(m => sum(col(m)).as(m)): _*),
      keyCol)

  /** Solve the ridge from a (possibly streamed/merged) moment state —
    * same fixed-shape solve as [[ridgeByKey]], so fit-from-state is
    * bit-equal to fit-from-rows over the same data (spec-pinned). */
  def ridgeFromState(state: DataFrame, keyCol: String,
      lambda2: Double): DataFrame = {
    require(lambda2 >= 0.0, s"need lambda2 >= 0, got $lambda2")
    solve2(state, keyCol, lambda2)
  }

  private def canonicalize(state: DataFrame, keyCol: String): DataFrame =
    state.select(col(keyCol) +: (
      col("n").cast("long").as("n") +:
      Seq("s1", "s2", "sy").map(m => col(m).cast("decimal(38,2)").as(m)) ++:
      Seq("s11", "s12", "s22", "s1y", "s2y", "syy")
        .map(m => col(m).cast("decimal(38,4)").as(m))): _*)

  /** Logistic regression by Newton–Raphson/IRLS: each iteration is ONE
    * distributed pass aggregating the gradient Σ(y−p)x and the Hessian
    * ΣW xx' (+λI) — (d+1)(d+2)/2 + (d+1) doubles collected per round,
    * independent of corpus size — then a driver-side solve updates β.
    * Four iterations from β=0 reach ~quadratic-convergence accuracy on
    * well-conditioned problems; `ridge` keeps the Hessian invertible on
    * separable data (where the MLE diverges). This is the quality-
    * classifier trainer a curation pipeline runs over hashed/dense
    * features before filtering a corpus with [[logisticScore]].
    *
    * NOT oracle-hashable by design: `exp` is not bit-identical across
    * engines and the gradient sums are row-order doubles — the spec
    * checks it against an independent single-threaded replay instead
    * (the UnigramLm precedent). Returns β (intercept first); None when
    * a Hessian is singular (raise `ridge`). */
  def logisticFit(df: DataFrame, labelCol: String, xCols: Seq[String],
      iters: Int = 4, ridge: Double = 1e-6): Option[Seq[Double]] = {
    require(xCols.nonEmpty, "need at least one feature")
    require(iters >= 1 && ridge >= 0.0, s"bad iters=$iters ridge=$ridge")
    val k = xCols.size + 1
    val xs = lit(1.0) +: xCols.map(col(_).cast("double"))
    val y = col(labelCol).cast("double")
    val clean = df.filter(
      (col(labelCol).isNotNull +: xCols.map(col(_).isNotNull))
        .reduce(_ && _))
    var beta = Array.fill(k)(0.0)
    var i = 0
    while (i < iters) {
      val z = xs.zip(beta).map { case (x, b) => x * lit(b) }
        .reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val w = p * (lit(1.0) - p)
      val aggs =
        (for (r <- 0 until k; c <- r until k)
          yield sum(w * xs(r) * xs(c)).as(s"h_${r}_$c")) ++
        (0 until k).map(r => sum((y - p) * xs(r)).as(s"g_$r"))
      val row = clean.agg(aggs.head, aggs.tail: _*).collect().head
      if ((0 until row.length).exists(row.isNullAt)) return None // empty df
      val h = Array.tabulate(k, k) { (r, c) =>
        val (lo, hi) = if (r <= c) (r, c) else (c, r)
        val base = row.getAs[Double](s"h_${lo}_$hi")
        if (r == c) base + ridge else base
      }
      val g = Array.tabulate(k)(r => row.getAs[Double](s"g_$r"))
      solveInPlace(h, g) match {
        case None => return None
        case Some(delta) =>
          beta = beta.zip(delta).map { case (b, dd) => b + dd }
      }
      i += 1
    }
    Some(beta.toSeq)
  }

  /** Chow test (Chow 1960): did the regression RELATIONSHIP change
    * between two segments (before/after a deploy, old/new source)?
    * F = [(SSE_pooled − ΣSSE_seg)/k] / [ΣSSE_seg/(n − 2k)] with k = 3
    * parameters — the structural-break companion of [[ridgeByKey]]
    * (which sees one fit) and of Stats' DiD (which sees means, not
    * slopes).
    *
    * ONE corpus pass: the per-segment moment rows ([[momentAgg]]) plus
    * an unpartitioned 2-row window give both segment fits AND the
    * pooled fit (pooled moments = segment sums — exact decimal
    * addition), each solved by the shared fixed-shape Cramer tree with
    * SSEs as the expanded quadratic form. The only cross-row double
    * reduction is a TWO-term sum (IEEE addition is commutative, so
    * 2-row aggregation order cannot change it). `segCol` must take
    * exactly two values — enforced in the output guard, not assumed.
    *
    * Output one row: n, n_segments, sse_pooled, sse_segments, f (null
    * unless exactly 2 nonsingular segments, a nonsingular pooled fit,
    * n > 2k, and a positive within-segment SSE). */
  def chowTest(df: DataFrame, segCol: String, yCol: String,
      x1Col: String, x2Col: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val per = momentAgg(df, segCol, yCol, x1Col, x2Col)
    val withTot = MomentNames.foldLeft(per) { (acc, m) =>
      acc.withColumn(s"g_$m", sum(col(m)).over(w))
    }
    val seg = moments2("")
    val glob = moments2("g_")
    val (detS, b0s, b1s, b2s) = cramer2(seg, 0.0)
    val (detG, g0, g1, g2) = cramer2(glob, 0.0)
    val sseSeg = sse2(seg, b0s, b1s, b2s)
    val sseP = sse2(glob, g0, g1, g2)
    val agg = withTot.agg(
      count(lit(1)).as("n_segments"),
      sum(col("n")).cast("long").as("n"),
      sum(when(detS =!= 0.0, sseSeg)).as("sse_segments"),
      min(when(detS =!= 0.0, lit(1)).otherwise(lit(0))).as("__ok"),
      max(when(detG =!= 0.0, sseP)).as("sse_pooled"))
    val k = lit(3.0)
    val nD = col("n").cast("double")
    val f = ((col("sse_pooled") - col("sse_segments")) / k) /
      (col("sse_segments") / (nD - lit(6.0)))
    agg.select(col("n"), col("n_segments"),
      col("sse_pooled"), col("sse_segments"),
      when(col("n_segments") === 2 && col("__ok") === 1 &&
        col("sse_pooled").isNotNull && col("n") > 6 &&
        col("sse_segments") > 0.0, f).as("f"))
  }

  /** Logistic regression by IRLS over the DISCRETE-FEATURE GRID —
    * the oracle-hashable counterpart of [[logisticFit]]: where that
    * fit aggregates row-order double sums (engine-specific by design),
    * this one collapses the corpus to its distinct (x1, x2, y) cells
    * FIRST (one corpus pass; the features must be categorical/
    * discretized — bin upstream, the [[Stats.ksStatistic]] contract),
    * then runs `iters` fully RELATIONAL Newton steps on the cell
    * table in PURE INTEGER/DOUBLE arithmetic: per-cell μ quantizes
    * through floor(μ·1e8) — an exact IEEE op on a bit-identical
    * double, never a double→decimal CAST (Spark rounds via
    * Double.toString's shortest repr, DuckDB via the binary value — a
    * residual straddle risk the floor form removes entirely; the
    * measured miss of the decimal-cast form of this operator traced to
    * fractional-scale DECIMAL→double conversions, fixed below). The
    * weight
    * w = μ₈·(1e8−μ₈) and working product floor(w·z·1e12) are exact
    * integers, the weighted moments exact DECIMAL(38,0) integer sums
    * (order-independent), and the Cramer solve is the [[ridgeByKey]]
    * fixed-shape double tree over moments rescaled by exact
    * power-of-ten divisions — so a DuckDB oracle replays the unrolled
    * iteration bit-for-bit.
    *
    * η clamps to ±25 before exp, and μ₈ to [1, 1e8−1], keeping w
    * nonzero (the standard IRLS step-halving concern does not arise
    * on a clamped, grid-sized system). β enters each round as a
    * broadcast one-row frame; nothing ever collects. Features enter
    * as exact cents (DECIMAL(18,2)·100 → long); coefficients are
    * reported on the ORIGINAL feature scale.
    *
    * Output one row: n, then b0/b1/b2 after the LAST iteration (null
    * if any round's normal matrix was singular). */
  def logisticIrlsGrid(df: DataFrame, yCol: String, x1Col: String,
      x2Col: String, iters: Int = 3,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1,8], got $iters")
    val spark = df.sparkSession
    def i38(c: Column) = c.cast("decimal(38,0)")
    val grid = scope.retain(df
      .filter(col(yCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .groupBy((d(col(x1Col)) * 100).cast("long").as("x1c"),
        (d(col(x2Col)) * 100).cast("long").as("x2c"),
        col(yCol).cast("long").as("y"))
      .agg(count(lit(1)).as("cnt")))
    var beta = spark.range(1).select(lit(0.0).as("b0"),
      lit(0.0).as("b1"), lit(0.0).as("b2"))
    for (_ <- 1 to iters) {
      val it = grid.crossJoin(broadcast(beta))
      val eta = col("b0") +
        col("b1") * (col("x1c").cast("double") / lit(100.0)) +
        col("b2") * (col("x2c").cast("double") / lit(100.0))
      val etac = greatest(least(eta, lit(25.0)), lit(-25.0))
      val mu = lit(1.0) / (lit(1.0) + exp(-etac))
      val scored = it
        .withColumn("etac", etac)
        .withColumn("mu8",
          greatest(least(floor(mu * lit(1.0e8)), lit(99999999L)),
            lit(1L)))
        .withColumn("w16", col("mu8") * (lit(100000000L) - col("mu8")))
        .withColumn("wz12", floor(
          (col("w16").cast("double") / lit(1.0e16)) *
            (col("etac") + (col("y").cast("double") -
              col("mu8").cast("double") / lit(1.0e8)) /
              (col("w16").cast("double") / lit(1.0e16))) * lit(1.0e12)))
      val agg = scored.agg(
        sum(i38(col("cnt")) * col("w16")).as("sww"),
        sum(i38(col("cnt")) * col("x1c") * col("w16")).as("swx1"),
        sum(i38(col("cnt")) * col("x2c") * col("w16")).as("swx2"),
        sum(i38(col("cnt")) * col("x1c") * col("x1c") * col("w16"))
          .as("swx11"),
        sum(i38(col("cnt")) * col("x1c") * col("x2c") * col("w16"))
          .as("swx12"),
        sum(i38(col("cnt")) * col("x2c") * col("x2c") * col("w16"))
          .as("swx22"),
        sum(i38(col("cnt")) * col("wz12")).as("swz"),
        sum(i38(col("cnt")) * col("x1c") * col("wz12")).as("swzx1"),
        sum(i38(col("cnt")) * col("x2c") * col("wz12")).as("swzx2"))
      // integer sums → true-unit moments, via the engine-neutral
      // conversion below.
      def dv(name: String, pow: Double) = intMomentToDouble(col(name), pow)
      val (sww, swx1, swx2) =
        (dv("sww", 1.0e16), dv("swx1", 1.0e18), dv("swx2", 1.0e18))
      val (swx11, swx12, swx22) = (dv("swx11", 1.0e20),
        dv("swx12", 1.0e20), dv("swx22", 1.0e20))
      val (swz, swzx1, swzx2) =
        (dv("swz", 1.0e12), dv("swzx1", 1.0e14), dv("swzx2", 1.0e14))
      val det = det3(sww, swx1, swx2,
        swx1, swx11, swx12, swx2, swx12, swx22)
      val det0 = det3(swz, swx1, swx2,
        swzx1, swx11, swx12, swzx2, swx12, swx22)
      val det1 = det3(sww, swz, swx2,
        swx1, swzx1, swx12, swx2, swzx2, swx22)
      val det2 = det3(sww, swx1, swz,
        swx1, swx11, swzx1, swx2, swx12, swzx2)
      beta = agg.select(
        when(det =!= 0.0, det0 / det).as("b0"),
        when(det =!= 0.0, det1 / det).as("b1"),
        when(det =!= 0.0, det2 / det).as("b2"))
    }
    grid.agg(sum(col("cnt")).cast("long").as("n"))
      .crossJoin(broadcast(beta))
  }

  /** Huber robust regression by IRLS — least squares whose influence
    * function saturates at `delta`, so a fat-tailed y (prices, dwell
    * times, token counts) cannot let a few outliers steer the fit the
    * way OLS ([[ridgeByKey]]) does, while staying fully efficient on
    * the inliers (the advantage over [[Robust]]'s Theil-Sen, which
    * ignores magnitudes entirely).
    *
    * ORACLE-HASHED like [[logisticIrlsGrid]], and simpler: the Huber
    * weight w = min(1, δ/|r|) needs NO libm call, so the rounds run
    * over RAW ROWS (no grid collapse required). Values enter as exact
    * cents; each round's weight quantizes via floor(w·1e8) (pure IEEE
    * — bit-identical everywhere), the weighted moments are exact
    * DECIMAL(38,0) integer sums, conversions go through
    * [[intMomentToDouble]]'s 2^53 split, and the Cramer solve is the
    * shared fixed-shape tree. β starts at 0 — the first round is then
    * a bounded-influence LS, and `iters` ≈ 4–6 reaches IRLS's usual
    * fixed point on well-conditioned data.
    *
    * Scale shape: `iters` corpus scans of a cached 4-column cent
    * projection, each a map-side-combined aggregate to ONE row — no
    * join, no window, no collect. Output one row: n, b0, b1, b2 (null
    * if any round's normal matrix was singular). */
  def huberIrls(df: DataFrame, yCol: String, x1Col: String,
      x2Col: String, delta: Double, iters: Int = 4,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1,8], got $iters")
    require(delta > 0.0, s"delta must be > 0, got $delta")
    val spark = df.sparkSession
    def i38(c: Column) = c.cast("decimal(38,0)")
    val rows = scope.retain(df
      .filter(col(yCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .select((d(col(yCol)) * 100).cast("long").as("yc"),
        (d(col(x1Col)) * 100).cast("long").as("x1c"),
        (d(col(x2Col)) * 100).cast("long").as("x2c")))
    var beta = spark.range(1).select(lit(0.0).as("b0"),
      lit(0.0).as("b1"), lit(0.0).as("b2"))
    for (_ <- 1 to iters) {
      val it = rows.crossJoin(broadcast(beta))
      val yD = col("yc").cast("double") / lit(100.0)
      val r = yD - (col("b0") +
        col("b1") * (col("x1c").cast("double") / lit(100.0)) +
        col("b2") * (col("x2c").cast("double") / lit(100.0)))
      // w = min(1, δ/|r|): comparisons and one division — libm-free
      val w = when(abs(r) <= lit(delta), lit(1.0))
        .otherwise(lit(delta) / abs(r))
      val scored = it.withColumn("w8", floor(w * lit(1.0e8)))
      val agg = scored.agg(
        count(lit(1)).as("n"),
        sum(i38(col("w8"))).as("sww"),
        sum(i38(col("w8")) * col("x1c")).as("swx1"),
        sum(i38(col("w8")) * col("x2c")).as("swx2"),
        sum(i38(col("w8")) * col("x1c") * col("x1c")).as("swx11"),
        sum(i38(col("w8")) * col("x1c") * col("x2c")).as("swx12"),
        sum(i38(col("w8")) * col("x2c") * col("x2c")).as("swx22"),
        sum(i38(col("w8")) * col("yc")).as("swy"),
        sum(i38(col("w8")) * col("x1c") * col("yc")).as("swx1y"),
        sum(i38(col("w8")) * col("x2c") * col("yc")).as("swx2y"))
      def dv(name: String, pow: Double) =
        intMomentToDouble(col(name), pow)
      val (sww, swx1, swx2) =
        (dv("sww", 1.0e8), dv("swx1", 1.0e10), dv("swx2", 1.0e10))
      val (swx11, swx12, swx22) = (dv("swx11", 1.0e12),
        dv("swx12", 1.0e12), dv("swx22", 1.0e12))
      val (swy, swx1y, swx2y) =
        (dv("swy", 1.0e10), dv("swx1y", 1.0e12), dv("swx2y", 1.0e12))
      val det = det3(sww, swx1, swx2,
        swx1, swx11, swx12, swx2, swx12, swx22)
      val det0 = det3(swy, swx1, swx2,
        swx1y, swx11, swx12, swx2y, swx12, swx22)
      val det1 = det3(sww, swy, swx2,
        swx1, swx1y, swx12, swx2, swx2y, swx22)
      val det2 = det3(sww, swx1, swy,
        swx1, swx11, swx1y, swx2, swx12, swx2y)
      beta = agg.select(
        when(det =!= 0.0, det0 / det).as("b0"),
        when(det =!= 0.0, det1 / det).as("b1"),
        when(det =!= 0.0, det2 / det).as("b2"))
    }
    rows.agg(count(lit(1)).cast("long").as("n"))
      .crossJoin(broadcast(beta))
  }

  /** σ(β·x) as a pure map expression — the corpus-filtering side of
    * [[logisticFit]]. β is broadcast by value (it's d+1 doubles). */
  def logisticScore(df: DataFrame, beta: Seq[Double], xCols: Seq[String],
      outCol: String): DataFrame = {
    require(beta.size == xCols.size + 1,
      s"beta has ${beta.size} entries for ${xCols.size} features + intercept")
    val xs = lit(1.0) +: xCols.map(col(_).cast("double"))
    val z = xs.zip(beta).map { case (x, b) => x * lit(b) }.reduce(_ + _)
    df.withColumn(outCol, lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** Gaussian elimination with partial pivoting; None when a pivot is
    * exactly 0 after pivoting (singular system). */
  private[operators] def solveInPlace(a: Array[Array[Double]],
      b: Array[Double]): Option[Array[Double]] = {
    val k = b.length
    for (p <- 0 until k) {
      val piv = (p until k).maxBy(r => math.abs(a(r)(p)))
      if (a(piv)(p) == 0.0) return None
      if (piv != p) { val t = a(piv); a(piv) = a(p); a(p) = t
        val tb = b(piv); b(piv) = b(p); b(p) = tb }
      for (r <- p + 1 until k) {
        val f = a(r)(p) / a(p)(p)
        for (c <- p until k) a(r)(c) -= f * a(p)(c)
        b(r) -= f * b(p)
      }
    }
    val x = new Array[Double](k)
    for (i <- (k - 1) to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until k) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    Some(x)
  }

  /** Score a corpus against a fitted one-row-per-key model table: an
    * equi-join on the key. `broadcastFit = true` (default) hints the
    * model side — right whenever the model count is human-scale; pass
    * false for corpus-sized key domains (one model per domain/user) and
    * let Catalyst/AQE pick the shuffle join. Appends
    * `predCol` = b0 + b1·x1 + b2·x2. */
  def score(df: DataFrame, fit: DataFrame, keyCol: String,
      x1Col: String, x2Col: String, predCol: String,
      broadcastFit: Boolean = true): DataFrame = {
    val sel = fit.select(col(keyCol), col("b0"), col("b1"), col("b2"))
    df.join(if (broadcastFit) broadcast(sel) else sel, Seq(keyCol), "left")
      .withColumn(predCol,
        col("b0") + col("b1") * col(x1Col).cast("double") +
          col("b2") * col(x2Col).cast("double"))
      .drop("b0", "b1", "b2")
  }

  /** Poisson (log-link) regression by IRLS over the discrete-feature
    * grid — count outcomes (events per user, tokens per doc, defects
    * per batch) where [[logisticIrlsGrid]]'s 0/1 target and
    * [[ridgeByKey]]'s unbounded-Gaussian target are both wrong models.
    * Same oracle-hashable construction as the logistic form, ONE grid
    * simplification: the Poisson working response is LINEAR in y
    * (w·z = μ·(η−1) + y per row), so the grid collapses to distinct
    * (x1, x2) cells carrying (count, Σy) — no y dimension, a strictly
    * smaller cell table.
    *
    * Per round on the cached grid: η clamps to [−25, 10] (rate cap
    * e^10 ≈ 2.2e4 — a contract bound, not a fit bound), μ quantizes
    * via floor(exp(η)·1e8) (floor-on-double, the portable waypoint;
    * exp runs once per bounded grid cell), the per-cell working sum
    * quantizes via floor(·1e9) — 1e9 rather than the logistic 1e12
    * buys 2^63 headroom on cnt·μ-heavy cells (contract: per-cell
    * cnt·μ·|η−1|·1e9 < 2^63) — weighted moments sum in DECIMAL(38,0),
    * conversions pass [[intMomentToDouble]]'s 2^53 split, and the
    * Cramer solve is the shared fixed-shape tree. β enters each round
    * as a broadcast one-row frame; nothing collects.
    *
    * Output one row: n, b0, b1, b2 (null if any round's normal matrix
    * was singular). */
  def poissonIrlsGrid(df: DataFrame, yCol: String, x1Col: String,
      x2Col: String, iters: Int = 3,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1,8], got $iters")
    val spark = df.sparkSession
    def i38(c: Column) = c.cast("decimal(38,0)")
    val grid = scope.retain(df
      .filter(col(yCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .groupBy((d(col(x1Col)) * 100).cast("long").as("x1c"),
        (d(col(x2Col)) * 100).cast("long").as("x2c"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(yCol).cast("long")).as("sy")))
    var beta = spark.range(1).select(lit(0.0).as("b0"),
      lit(0.0).as("b1"), lit(0.0).as("b2"))
    for (_ <- 1 to iters) {
      val it = grid.crossJoin(broadcast(beta))
      val eta = col("b0") +
        col("b1") * (col("x1c").cast("double") / lit(100.0)) +
        col("b2") * (col("x2c").cast("double") / lit(100.0))
      val etac = greatest(least(eta, lit(10.0)), lit(-25.0))
      val scored = it
        .withColumn("etac", etac)
        .withColumn("mu8",
          greatest(floor(exp(col("etac")) * lit(1.0e8)), lit(1L)))
        .withColumn("wz9", floor(
          (col("cnt").cast("double") *
            (col("mu8").cast("double") / lit(1.0e8)) *
            (col("etac") - lit(1.0)) + col("sy").cast("double")) *
            lit(1.0e9)))
      val agg = scored.agg(
        sum(i38(col("cnt")) * col("mu8")).as("sww"),
        sum(i38(col("cnt")) * col("mu8") * col("x1c")).as("swx1"),
        sum(i38(col("cnt")) * col("mu8") * col("x2c")).as("swx2"),
        sum(i38(col("cnt")) * col("mu8") * col("x1c") * col("x1c"))
          .as("swx11"),
        sum(i38(col("cnt")) * col("mu8") * col("x1c") * col("x2c"))
          .as("swx12"),
        sum(i38(col("cnt")) * col("mu8") * col("x2c") * col("x2c"))
          .as("swx22"),
        sum(i38(col("wz9"))).as("swz"),
        sum(i38(col("wz9")) * col("x1c")).as("swzx1"),
        sum(i38(col("wz9")) * col("x2c")).as("swzx2"))
      def dv(name: String, pow: Double) = intMomentToDouble(col(name), pow)
      val (sww, swx1, swx2) =
        (dv("sww", 1.0e8), dv("swx1", 1.0e10), dv("swx2", 1.0e10))
      val (swx11, swx12, swx22) = (dv("swx11", 1.0e12),
        dv("swx12", 1.0e12), dv("swx22", 1.0e12))
      val (swz, swzx1, swzx2) =
        (dv("swz", 1.0e9), dv("swzx1", 1.0e11), dv("swzx2", 1.0e11))
      val det = det3(sww, swx1, swx2,
        swx1, swx11, swx12, swx2, swx12, swx22)
      val det0 = det3(swz, swx1, swx2,
        swzx1, swx11, swx12, swzx2, swx12, swx22)
      val det1 = det3(sww, swz, swx2,
        swx1, swzx1, swx12, swx2, swzx2, swx22)
      val det2 = det3(sww, swx1, swz,
        swx1, swx11, swzx1, swx2, swx12, swzx2)
      beta = agg.select(
        when(det =!= 0.0, det0 / det).as("b0"),
        when(det =!= 0.0, det1 / det).as("b1"),
        when(det =!= 0.0, det2 / det).as("b2"))
    }
    grid.agg(sum(col("cnt")).cast("long").as("n"))
      .crossJoin(broadcast(beta))
  }
}
