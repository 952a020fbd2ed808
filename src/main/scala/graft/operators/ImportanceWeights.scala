package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.TextFunctions

/** DSIR-style importance reweighting — score a raw corpus by how much
  * each document looks drawn from a TARGET distribution rather than the
  * raw one, using hashed n-gram features (public method: Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"). Features are unigrams + adjacent bigrams of the
  * normalized token stream, hashed into B = 16^hexDigits buckets by an
  * md5 prefix; a document's weight is the sum over its features of the
  * per-bucket log-likelihood ratio ln p_target(b) - ln p_raw(b), both
  * alpha-smoothed. Selection composes downstream:
  * [[Sampling.keepTopFraction]] (exact) or [[Sampling.cutoffForKeepRate]]
  * (sketch cutoff, map-side filter) over the score column.
  *
  * Shape at scale: each corpus collapses to a B-bounded bucket-count
  * table in one pass (B is a few thousand — broadcast by construction);
  * the ratio table is a full-outer join of two B-row tables; scoring is
  * one (doc, bucket) aggregation followed by a broadcast join against
  * the ratio table — no vocabulary-sized state anywhere, which is the
  * entire point of the hashing. Per-bucket ratios are rounded into
  * DECIMAL(20,12) so the per-document sum is order-independent.
  */
object ImportanceWeights {

  /** Hashed feature stream of one document text: md5-prefix buckets of
    * unigrams and space-joined bigrams. */
  private def buckets(textCol: Column, hexDigits: Int): Column = {
    val a = split(TextFunctions.normalize(textCol), " ")
    val bigrams = transform(NgramLm.bigramsOfTokens(a),
      p => concat(p("w1"), lit(" "), p("w2")))
    transform(concat(a, bigrams), f => substring(md5(f), 1, hexDigits))
  }

  /** (bucket, cnt): hashed-feature bucket counts for a corpus — one
    * corpus pass, output bounded by 16^hexDigits rows. */
  def bucketCounts(docs: DataFrame, textCol: String,
      hexDigits: Int): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 8,
      s"hexDigits must be in [1, 8], got $hexDigits")
    docs.select(explode(buckets(col(textCol), hexDigits)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** (bucket, llr): smoothed per-bucket log-likelihood ratio between a
    * target and a raw corpus's [[bucketCounts]],
    * ln((t_b + a) / (T + aB)) - ln((r_b + a) / (R + aB)), as
    * DECIMAL(20,12). Buckets absent from both corpora are absent here —
    * a document drawn from either corpus can never hit one. */
  def logRatios(targetCounts: DataFrame, rawCounts: DataFrame,
      hexDigits: Int, alpha: Double = 1.0,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0 (smoothing floor), got $alpha")
    val b = math.pow(16.0, hexDigits)
    // each count table feeds its total AND the outer join — retained so
    // the corpus-aggregation lineage behind it runs once
    val t = scope.retain(targetCounts)
    val r = scope.retain(rawCounts)
    val totals = broadcast(
      t.agg(sum(col("cnt")).as("__tt")).crossJoin(
        r.agg(sum(col("cnt")).as("__rt"))))
    t.select(col("bucket"), col("cnt").as("__tc"))
      .join(r.select(col("bucket"), col("cnt").as("__rc")),
        Seq("bucket"), "full_outer")
      .crossJoin(totals)
      .select(col("bucket"),
        (log((coalesce(col("__tc"), lit(0L)).cast("double") + lit(alpha)) /
            (coalesce(col("__tt"), lit(0L)).cast("double") + lit(alpha * b))) -
          log((coalesce(col("__rc"), lit(0L)).cast("double") + lit(alpha)) /
            (coalesce(col("__rt"), lit(0L)).cast("double") + lit(alpha * b))))
          .cast("decimal(20,12)").as("llr"))
  }

  /** The score epilogue over a (…, bucket, __nb) table joined to a
    * ratio table: per-group feature accounting plus the weighted LLR
    * sum. `__nb` is multiplied as DECIMAL(10,0) so the product keeps
    * the ratio's full 12-digit scale — long × decimal(20,12) would
    * resolve to decimal(38,9), rounding each product differently than
    * the oracle and flipping selection order at a keep-fraction
    * boundary (NOTES engine-parity rule 1); the sum is pinned to
    * DECIMAL(38,12) on both engines. */
  private def scoreAgg(withRatios: DataFrame,
      groupCols: Seq[Column]): DataFrame =
    withRatios.groupBy(groupCols: _*)
      .agg(sum(col("__nb")).as("n_feats"),
        sum(when(col("llr").isNotNull, col("__nb")).otherwise(0L))
          .as("n_scored"),
        sum(col("__nb").cast("decimal(10,0)") * coalesce(col("llr"),
          lit(java.math.BigDecimal.ZERO).cast("decimal(20,12)")))
          .cast("decimal(38,12)").as("score"))

  /** (doc_id, n_feats, n_scored, score): per-document importance weight
    * under a [[logRatios]] table. n_feats counts the document's hashed
    * features; n_scored counts those whose bucket the ratio table knows
    * (equal whenever the document comes from one of the two corpora —
    * the DSIR setting; a gap means out-of-pool input and the score only
    * sums the known part). Documents with no features (NULL/empty-token
    * text) are absent — unscorable, the caller's policy decision. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, hexDigits: Int): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 8,
      s"hexDigits must be in [1, 8], got $hexDigits")
    scoreAgg(
      docs.select(col(idCol).as("doc_id"),
          explode(buckets(col(textCol), hexDigits)).as("bucket"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("__nb"))
        .join(broadcast(ratios), Seq("bucket"), "left"),
      Seq(col("doc_id")))
  }

  /** The composed DSIR pipeline when target and raw are subsets of ONE
    * corpus (the usual setting: target = an in-corpus slice picked by
    * `isTarget`): equivalent to [[bucketCounts]] ×2 + [[logRatios]] +
    * [[score]], but the corpus is scanned and feature-exploded exactly
    * once — the retained (doc_id, carry…, bucket) stream feeds the
    * target counts, the raw counts, and the per-document counts, where
    * the naive composition would explode the corpus three times and
    * scan it four. `carry` columns (e.g. a language key for downstream
    * stratified selection) must be functionally dependent on `idCol`;
    * rows where `isTarget` is NULL count as non-target. */
  def scoreAgainstTarget(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, hexDigits: Int, alpha: Double = 1.0,
      carry: Seq[String] = Nil,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 8,
      s"hexDigits must be in [1, 8], got $hexDigits")
    val fb = scope.retain(docs.select(
      col(idCol).as("doc_id") +: carry.map(col) :+ isTarget.as("__t") :+
        explode(buckets(col(textCol), hexDigits)).as("bucket"): _*))
    val targetCounts = fb.filter(col("__t"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val rawCounts = fb.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val ratios = logRatios(targetCounts, rawCounts, hexDigits, alpha, scope)
    scoreAgg(
      fb.groupBy(col("doc_id") +: carry.map(col) :+ col("bucket"): _*)
        .agg(count(lit(1)).as("__nb"))
        .join(broadcast(ratios), Seq("bucket"), "left"),
      col("doc_id") +: carry.map(col))
  }
}
