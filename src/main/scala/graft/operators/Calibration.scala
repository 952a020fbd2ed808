package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** Classifier-calibration diagnostics: reliability table + exact ECE,
  * Brier score, and thresholded confusion/PRF — the evaluation legs that
  * sit beside `LinearModel` (fit/score) and `Auc` (ranking quality) in a
  * training pipeline's readout. A score filter that gates corpus
  * admission (quality classifiers, toxicity screens) is only trustworthy
  * if its probabilities are CALIBRATED — this family is how that is
  * measured at corpus scale.
  *
  * Engine-exact contract: scores enter as integer MICRO units
  * (`score_micro` in [0, 1e6] = probability × 1e6 — the repo's ppm
  * convention), so every statistic is integer arithmetic up to a final
  * fixed-shape double expression over exactly-represented operands:
  *
  *  - ECE numerator  sum_b |1e6·pos_b − s_b|  is a LONG; ECE is ONE
  *    division by (1e6·N).
  *  - Brier numerator sum (s − 1e6·y)² is summed in DECIMAL(38,0)
  *    (per-row terms ≤ 1e12 — a long sum overflows near 9e6 rows);
  *    Brier is one decimal→double cast and one division.
  *  - Confusion cells are conditional counts; precision/recall/F1 each
  *    reduce to a single division of integers (F1 = 2tp/(2tp+fp+fn)).
  *
  * Scale shape: one hash aggregation each (reliability groups on ≤
  * `bins` keys; brier/confusion are global partial+final aggregates).
  * No window, no join wider than a one-row broadcast cross. Reference
  * provenance: the reference has no model evaluation; definitions follow
  * public literature (Naeini et al. 2015 for ECE binning, Brier 1950).
  */
object Calibration {

  private val Micro = 1000000L

  /** Per-bin reliability table over `bins` equal-width score bins, with
    * the global exact ECE repeated on every row (the keySkewReport
    * global-column convention).
    *
    * Output: (bin, n, n_pos, score_micro_sum, conf, acc, ece_num, ece)
    * where conf = mean predicted probability, acc = empirical positive
    * rate, ece_num = sum_b |1e6·n_pos_b − score_micro_sum_b| (LONG,
    * exact), ece = ece_num / (1e6·N). Empty bins are absent (a bin with
    * no rows contributes nothing to ECE by definition).
    *
    * `labelCol` must be 0/1; `scoreMicroCol` integral in [0, 1e6]
    * (1e6 lands in the top bin via the `least` clamp; out-of-range
    * scores raise instead of skewing the readout). */
  def reliability(df: DataFrame, scoreMicroCol: String, labelCol: String,
      bins: Int, scope: CacheScope = CacheScope.session): DataFrame =
    reliabilityFromCounts(binCounts(df, scoreMicroCol, labelCol, bins),
      scope)

  /** Mergeable per-bin counter state — (bin, n, n_pos, score_micro_sum),
    * one aggregate pass. Counters are plain sums, so state from any
    * batch split merges by addition ([[mergeBinCounts]]): the persisted/
    * streaming-state path of the calibration family (the momentState /
    * CountMin pattern). */
  def binCounts(df: DataFrame, scoreMicroCol: String, labelCol: String,
      bins: Int): DataFrame =
    df.groupBy(
        // contract guard: score_micro ∈ [0, 1e6]. The `least` clamp puts
        // exactly 1e6 in the top bin; anything OUTSIDE the range raises
        // at scan time (raise_error is codegen'd, happy path unchanged)
        // instead of minting negative/overflow bin ids that silently
        // pollute the reliability table and ECE.
        when(col(scoreMicroCol) < 0L || col(scoreMicroCol) > Micro,
          raise_error(concat(
            lit(s"binCounts: $scoreMicroCol out of [0, 1e6]: "),
            col(scoreMicroCol).cast("string"))))
          .otherwise(least(
            expr(s"CAST($scoreMicroCol AS BIGINT) * $bins div ${Micro}L"),
            lit((bins - 1).toLong)))
          .cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(col(scoreMicroCol).cast("long")).as("score_micro_sum"))

  /** Fold accumulated bin-counter rows (any batch split, any order)
    * back to one row per bin — counter addition. */
  def mergeBinCounts(state: DataFrame): DataFrame =
    state.groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"),
        sum(col("score_micro_sum")).as("score_micro_sum"))

  /** The reliability table + exact ECE from (possibly pre-merged) bin
    * counters — the shared finisher of the direct and state paths. */
  def reliabilityFromCounts(counts: DataFrame,
      scope: CacheScope = CacheScope.session): DataFrame = {
    // retained: the per-bin frame is <= `bins` rows but its derivation
    // may be a corpus scan, and it feeds both the ECE total and the
    // output — without retention the scan runs twice (observed).
    val perBin = scope.retain(mergeBinCounts(counts)
      .withColumn("conf",
        col("score_micro_sum").cast("double") /
          (lit(1000000.0) * col("n").cast("double")))
      .withColumn("acc",
        col("n_pos").cast("double") / col("n").cast("double")))
    val global = perBin.agg(
        sum(abs(lit(Micro) * col("n_pos") - col("score_micro_sum")))
          .as("ece_num"),
        sum(col("n")).as("_n"))
      .select(col("ece_num"),
        (col("ece_num").cast("double") /
          (lit(1000000.0) * col("_n").cast("double"))).as("ece"))
    perBin.crossJoin(broadcast(global))
      .select(col("bin"), col("n"), col("n_pos"), col("score_micro_sum"),
        col("conf"), col("acc"), col("ece_num"), col("ece"))
  }

  /** One-row (n, brier): mean squared error of the micro-unit
    * probability against the 0/1 label. */
  def brier(df: DataFrame, scoreMicroCol: String, labelCol: String)
      : DataFrame = {
    val e = col(scoreMicroCol).cast("long") -
      lit(Micro) * col(labelCol).cast("long")
    df.agg(count(lit(1)).as("n"),
        sum((e * e).cast("decimal(38,0)")).as("_sq"))
      .select(col("n"),
        (col("_sq").cast("double") /
          (lit(1.0e12) * col("n").cast("double"))).as("brier"))
  }

  /** [[brier]] + [[confusionAt]] fused into ONE aggregate pass — the
    * shape a 100 TB readout wants (both are global aggregates over the
    * same rows; composing the two operators separately costs a second
    * corpus scan). Output: (n, brier, tp, fp, tn, fn, accuracy,
    * precision, recall, f1) — column-identical to crossing the two. */
  def evalAt(df: DataFrame, scoreMicroCol: String, labelCol: String,
      thresholdMicro: Long): DataFrame = {
    val pred = col(scoreMicroCol) >= thresholdMicro
    val pos = col(labelCol).cast("long") === 1L
    val e = col(scoreMicroCol).cast("long") -
      lit(Micro) * col(labelCol).cast("long")
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    df.agg(
        count(lit(1)).as("n"),
        sum((e * e).cast("decimal(38,0)")).as("_sq"),
        cnt(pred && pos).as("tp"), cnt(pred && !pos).as("fp"),
        cnt(!pred && !pos).as("tn"), cnt(!pred && pos).as("fn"))
      .select(col("n"),
        (col("_sq").cast("double") /
          (lit(1.0e12) * col("n").cast("double"))).as("brier"),
        col("tp"), col("fp"), col("tn"), col("fn"),
        (d(col("tp") + col("tn")) /
          d(col("tp") + col("fp") + col("tn") + col("fn"))).as("accuracy"),
        when(col("tp") + col("fp") > 0,
          d(col("tp")) / d(col("tp") + col("fp"))).as("precision"),
        when(col("tp") + col("fn") > 0,
          d(col("tp")) / d(col("tp") + col("fn"))).as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          d(lit(2L) * col("tp")) /
            d(lit(2L) * col("tp") + col("fp") + col("fn"))).as("f1"))
  }

  /** Isotonic (PAV) calibration mapping fitted on a [[reliability]]
    * table — the TRANSFORM companion to the audit (the privacy family's
    * audit→transform symmetry): pool-adjacent-violators over the
    * per-bin (n, n_pos) counts yields the monotone step function that
    * maps a raw score bin to a calibrated probability. Zadrozny &
    * Elkan 2002.
    *
    * The pooling runs DRIVER-SIDE on the collected bin table — at most
    * `bins` rows regardless of corpus size (the ridgeFit
    * corpus-size-independent-collect precedent); rates compare by
    * integer cross-multiplication, so pooling decisions are exact, and
    * the only double is each block's final pos/n division.
    *
    * Output: (bin, cal_n, cal_pos, cal_p) — one row per INPUT bin,
    * cal_* from its pooled block; cal_p is non-decreasing in bin.
    * Join back on the same bin expression to calibrate scores (see
    * [[calibrate]]). */
  def isotonicFromBins(reliability: DataFrame,
      maxBins: Int = graft.core.BoundedCollect.DefaultMaxCells)
      : DataFrame = {
    val spark = reliability.sparkSession
    // guarded collect: the bin table is ≤ `bins` rows by contract; the
    // cap surfaces a caller passing a per-row frame instead of a
    // reliability table (same guard family as Stats.cramersV).
    val bins = graft.core.BoundedCollect.rows(
        reliability.select("bin", "n", "n_pos"),
        maxBins,
        "isotonicFromBins reliability bins")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // PAV: pool while the previous block's rate EXCEEDS the next's
    // (pos_a/n_a > pos_b/n_b  <=>  pos_a*n_b > pos_b*n_a, exact).
    case class Block(bins: Vector[Int], n: Long, pos: Long)
    val pooled = bins.foldLeft(Vector.empty[Block]) { (acc, b) =>
      var cur = Block(Vector(b._1), b._2, b._3)
      var rest = acc
      while (rest.nonEmpty &&
          rest.last.pos * cur.n > cur.pos * rest.last.n) {
        val p = rest.last
        cur = Block(p.bins ++ cur.bins, p.n + cur.n, p.pos + cur.pos)
        rest = rest.dropRight(1)
      }
      rest :+ cur
    }
    val rows = pooled.flatMap(b => b.bins.map(bin =>
      (bin, b.n, b.pos, b.pos.toDouble / b.n.toDouble)))
    import spark.implicits._
    rows.toDF("bin", "cal_n", "cal_pos", "cal_p")
  }

  /** Apply an [[isotonicFromBins]] mapping: adds `cal_p` keyed by the
    * same micro-score bin expression [[reliability]] used. Scores in
    * bins unseen at fit time get a null `cal_p` (left join — surface,
    * don't invent). The mapping is <= `bins` rows — broadcast. */
  def calibrate(df: DataFrame, scoreMicroCol: String, mapping: DataFrame,
      bins: Int): DataFrame =
    df.withColumn("bin",
        least(
          expr(s"CAST($scoreMicroCol AS BIGINT) * $bins div ${Micro}L"),
          lit((bins - 1).toLong))
          .cast("int"))
      .join(broadcast(mapping.select(col("bin"), col("cal_p"))),
        Seq("bin"), "left")

  /** One-row confusion matrix + derived metrics at `thresholdMicro`
    * (predict positive when score_micro >= threshold):
    * (tp, fp, tn, fn, accuracy, precision, recall, f1). Each derived
    * metric is a single integer division (f1 via 2tp/(2tp+fp+fn));
    * NULL when its denominator is 0. */
  def confusionAt(df: DataFrame, scoreMicroCol: String, labelCol: String,
      thresholdMicro: Long): DataFrame = {
    val pred = col(scoreMicroCol) >= thresholdMicro
    val pos = col(labelCol).cast("long") === 1L
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    df.agg(
        cnt(pred && pos).as("tp"), cnt(pred && !pos).as("fp"),
        cnt(!pred && !pos).as("tn"), cnt(!pred && pos).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        (d(col("tp") + col("tn")) /
          d(col("tp") + col("fp") + col("tn") + col("fn"))).as("accuracy"),
        when(col("tp") + col("fp") > 0,
          d(col("tp")) / d(col("tp") + col("fp"))).as("precision"),
        when(col("tp") + col("fn") > 0,
          d(col("tp")) / d(col("tp") + col("fn"))).as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          d(lit(2L) * col("tp")) /
            d(lit(2L) * col("tp") + col("fp") + col("fn"))).as("f1"))
  }
}
