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
    val agg = df
      .filter(col(yCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .groupBy(col(keyCol)).agg(
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
    solve2(agg, keyCol, lambda2)
  }

  /** The Cramer solve as fixed-shape double expressions over the moment
    * row — shared by [[ridgeByKey]] and the SQL oracle (same tree ⇒
    * same bits). Normal matrix (row-major, intercept first):
    *   [ n   s1        s2      ] [b0]   [sy ]
    *   [ s1  s11+λ     s12     ] [b1] = [s1y]
    *   [ s2  s12       s22+λ   ] [b2]   [s2y]
    */
  private def solve2(agg: DataFrame, keyCol: String,
      lambda2: Double): DataFrame = {
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val sy = col("sy").cast("double")
    val s11r = col("s11").cast("double") // raw moments for the fit stats
    val s22r = col("s22").cast("double")
    val s11 = s11r + lit(lambda2) // penalised diagonal for the solve
    val s12 = col("s12").cast("double")
    val s22 = s22r + lit(lambda2)
    val s1y = col("s1y").cast("double")
    val s2y = col("s2y").cast("double")
    val syy = col("syy").cast("double")

    def det3(a: Column, b: Column, c: Column,
        p: Column, q: Column, r: Column,
        x: Column, y: Column, z: Column): Column =
      a * (q * z - r * y) - b * (p * z - r * x) + c * (p * y - q * x)

    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)

    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    // SSE expanded so it reads only the moment row: Σ(y-ŷ)² =
    // syy - 2(b0·sy + b1·s1y + b2·s2y) + b'X'Xb, and since b solves the
    // (regularised) normal equations exactly, b'X'Xb = b'(X'y - λb̃):
    // keep the explicit quadratic form instead — fixed shape, no
    // algebraic shortcut whose cancellation differs between engines.
    val sse = syy -
      lit(2.0) * (b0 * sy + b1 * s1y + b2 * s2y) +
      (b0 * (n * b0 + s1 * b1 + s2 * b2) +
        b1 * (s1 * b0 + s11r * b1 + s12 * b2) +
        b2 * (s2 * b0 + s12 * b1 + s22r * b2))
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
    * equi-join on the key (broadcast when the model table is small —
    * which it is, by construction: one row per model). Appends
    * `predCol` = b0 + b1·x1 + b2·x2. */
  def score(df: DataFrame, fit: DataFrame, keyCol: String,
      x1Col: String, x2Col: String, predCol: String): DataFrame =
    df.join(broadcast(fit.select(col(keyCol), col("b0"), col("b1"),
        col("b2"))), Seq(keyCol), "left")
      .withColumn(predCol,
        col("b0") + col("b1") * col(x1Col).cast("double") +
          col("b2") * col(x2Col).cast("double"))
      .drop("b0", "b1", "b2")
}
