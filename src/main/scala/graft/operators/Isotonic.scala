package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted isotonic (monotone non-decreasing) least-squares fit per
  * key over position-ordered bins — the PAVA solution computed through
  * the minimax characterization (Robertson, Wright & Dykstra 1988,
  * Thm 1.4.4):
  *
  *   fitted[k] = max over i ≤ k of ( min over j ≥ k of wmean(y[i..j]) )
  *
  * This is the calibration workhorse: isotonic regression of per-bin
  * outcome rates over the score axis IS isotonic calibration
  * (Zadrozny & Elkan 2002) — the non-parametric companion to the
  * [[Calibration]] reliability table.
  *
  * Exactness: every block mean is a rational (exact integer numerator
  * sum over exact positive weight sum); each quantizes through the
  * exact integral division trunc(1e9·num ÷ den) — the remainder-
  * subtract idiom truncates TOWARD ZERO (both engines' `%` follows the
  * dividend sign), which equals floor for ynum ≥ 0 — so the MIN/MAX
  * reductions are plain long comparisons and the whole fit is
  * engine-portable bit for bit. Fitted values are the nano-quantized
  * minimax — within 1e-9 of the real-valued fit, deterministically.
  * Contract: weight > 0; ynum of either sign is engine-portable, but
  * the quantization direction flips at zero (toward-zero, not floor) —
  * shift-encode signed data when a uniform floor matters.
  *
  * Shape at 100 TB: the corpus-scale work is whatever aggregation
  * BUILDS the bin table (callers bound bins per key by construction —
  * calibration bins, deciles, day grids). The fit itself runs on bins:
  * one |bins|²-per-key self-join, one reverse-running-min window, one
  * aggregate — never corpus-sized, no cross-key coupling.
  */
object Isotonic {

  private def i38(c: Column) = c.cast("decimal(38,0)")

  /** Fit over (keyCol, posCol, ynumCol, weightCol) rows — one row per
    * bin, pos need not be dense. Output: key, pos, ynum, weight,
    * fitted_nano (exact long), fitted (double) — fitted is
    * non-decreasing in pos within every key. */
  def fit(df: DataFrame, keyCol: String, posCol: String,
      ynumCol: String, weightCol: String,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    // the bin table is typically an AGGREGATE of a corpus-scale scan —
    // retained once so the i-side, j-side, and closing join all read
    // the cache instead of re-running the upstream scan three times
    val base = scope.retain(df
      .filter(col(weightCol) > 0 && col(ynumCol).isNotNull)
      .select(col(keyCol), col(posCol), col(ynumCol), col(weightCol)))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col(posCol))
    // inclusive prefix sums; the i-side subtracts its own bin back out
    // so block (i..j) reads as one exclusive-start difference
    val cum = base
      .select(col(keyCol), col(posCol),
        i38(col(ynumCol)).as("__y"), i38(col(weightCol)).as("__w"))
      .withColumn("__cs", sum(col("__y")).over(wCum))
      .withColumn("__cw", sum(col("__w")).over(wCum))
    val lo = cum.select(col(keyCol), col(posCol).as("__i"),
      (col("__cs") - col("__y")).as("__csx"),
      (col("__cw") - col("__w")).as("__cwx"))
    val hi = cum.select(col(keyCol), col(posCol).as("__j"),
      col("__cs"), col("__cw"))
    // A(i,j) = floor(1e9 · blocksum / blockweight), exact integral div
    val num = (col("__cs") - col("__csx")) * lit(1000000000L)
    val den = col("__cw") - col("__cwx")
    val aNano = ((num - num % den) / den).cast("decimal(38,0)")
      .cast("long")
    val pairs = lo.join(hi, Seq(keyCol))
      .filter(col("__i") <= col("__j"))
      .select(col(keyCol), col("__i"), col("__j"), aNano.as("__a"))
    // row (i, j) after the reverse running min holds
    // m(i, k=j) = min over j' >= j of A(i, j')
    val wRev = Window.partitionBy(col(keyCol), col("__i"))
      .orderBy(col("__j"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val m = pairs.withColumn("__m", min(col("__a")).over(wRev))
    // fitted(k) = max over i <= k of m(i, k): every row in group
    // (key, j) already has i <= j, so this is one plain aggregate
    val fit = m.groupBy(col(keyCol), col("__j"))
      .agg(max(col("__m")).as("fitted_nano"))
      .select(col(keyCol), col("__j").as(posCol), col("fitted_nano"))
    base.join(fit, Seq(keyCol, posCol))
      .select(col(keyCol), col(posCol), col(ynumCol), col(weightCol),
        col("fitted_nano"),
        (col("fitted_nano").cast("double") / lit(1.0e9)).as("fitted"))
  }
}
