package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.TextFunctions

/** Bigram language-model scoring — the conditional-probability step up
  * from [[RareTokens]]' unigram rarity: score each document by its
  * average add-k-smoothed bigram log-probability under a model trained
  * on a (possibly different) corpus. This is the relational form of the
  * CCNet-style LM perplexity filter (public paper): fluent text scores
  * near the corpus average; shuffled/garbled text with improbable token
  * TRANSITIONS — which unigram counts cannot see — scores far below it.
  *
  * p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*V), V = |distinct successor
  * vocabulary|; a document's score is the mean ln p over its bigrams
  * (documents with fewer than two tokens have no bigrams and are
  * absent — unscorable, the caller's policy decision).
  *
  * Shape at scale: the model is one (w1,w2)-keyed aggregation; context
  * counts c(w1) derive from the model table (never a second corpus
  * pass); V enters as a broadcast one-row aggregate. Scoring is two
  * token-keyed shuffle joins — the count tables are vocabulary-sized
  * and therefore NEVER broadcast (TfIdf/RareTokens design rule). Each
  * bigram's log-probability is rounded into DECIMAL(20,12) before the
  * per-document sum so the aggregation order cannot perturb the mean.
  */
object NgramLm {

  /** Interior bigrams of the normalized token stream as
    * array<struct<w1,w2>> — empty (not NULL-poisoned) for texts with
    * fewer than two tokens. */
  private def bigramPairs(textCol: Column): Column =
    bigramsOfTokens(split(TextFunctions.normalize(textCol), " "))

  /** Bigram core over an already-tokenized array — shared with
    * [[Cooccurrence]] so both operators agree on what a bigram is. */
  private[operators] def bigramsOfTokens(a: Column): Column = {
    val idx = when(size(a) >= 2, sequence(lit(1), size(a) - 1))
      .otherwise(array().cast("array<int>"))
    transform(idx, i => struct(element_at(a, i).as("w1"),
      element_at(a, i + 1).as("w2")))
  }

  /** Train: corpus bigram counts (w1, w2, c12). One token-pair shuffle. */
  def model(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(bigramPairs(col(textCol))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))

  /** Score `docs` under a trained `model`: (doc_id, n_bigrams,
    * avg_logprob). Bigrams unseen in training count c12 = 0 (the add-k
    * floor keeps the probability finite). An EMPTY model (no training
    * document had two tokens) has no vocabulary to smooth over, so every
    * avg_logprob is NULL — deliberate, guarded, and spec-pinned rather
    * than an accidental ln(x/0) artifact. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      bigrams: DataFrame, addK: Double = 0.1,
      scope: CacheScope = CacheScope.session): DataFrame =
    scoreBigrams(
      docs.select(col(idCol).as("doc_id"),
          explode(bigramPairs(col(textCol))).as("bg"))
        .select(col("doc_id"), col("bg.w1"), col("bg.w2")),
      bigrams, addK, scope)

  /** Scoring core over a pre-exploded (doc_id, w1, w2) bigram stream. */
  private def scoreBigrams(docBg: DataFrame, model: DataFrame,
      addK: Double, scope: CacheScope): DataFrame = {
    require(addK > 0.0, s"addK must be > 0 (smoothing floor), got $addK")
    // the model feeds three consumers (join probe, context counts, V) —
    // retained so its aggregation lineage runs once, not per consumer
    val bigrams = scope.retain(model)
    val ctx = bigrams.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = bigrams.agg(count_distinct(col("w2")).as("v"))
    docBg
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        when(col("v") > 0,
          log((coalesce(col("c12"), lit(0L)).cast("double") + lit(addK)) /
            (coalesce(col("c1"), lit(0L)).cast("double") +
              lit(addK) * col("v").cast("double"))))
          .otherwise(lit(null).cast("double"))
          .cast("decimal(20,12)"))
      // the integer count profile rides along with the float score: the
      // counts are bit-reproducible on any engine (the oracle compares
      // them), while avg_logprob is libm territory (spec-pinned instead)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("c12"), lit(0L))).as("sum_c12"),
        sum(coalesce(col("c1"), lit(0L))).as("sum_c1"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("n_unseen"),
        sum(col("lp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_c12"),
        col("sum_c1"), col("n_unseen"),
        (col("slp").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_logprob"))
  }

  /** Self-scoring convenience (train and score on the same corpus): the
    * exploded bigram stream is retained so the scan+tokenize pipeline
    * feeds both the model aggregation and the scoring probe once. */
  def selfScore(docs: DataFrame, idCol: String, textCol: String,
      addK: Double = 0.1,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val docBg = scope.retain(docs
      .select(col(idCol).as("doc_id"),
        explode(bigramPairs(col(textCol))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2")))
    val m = docBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    scoreBigrams(docBg, m, addK, scope)
  }

  /** Interpolated Kneser–Ney self-scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999's benchmark smoother) with the standard fixed
    * discount d = 0.75: each bigram scores
    * P(w2|w1) = (c12 − d)/c1 + d·N₁₊(w1·)/c1 · N₁₊(·w2)/T — the
    * discounted MLE interpolated with the CONTINUATION probability
    * (how many distinct contexts w2 follows, not how often), the
    * insight that makes KN the right smoother for natural text.
    *
    * Engine-exact by construction: all five model statistics (c12, c1,
    * N₁₊(w1·) right-type count, N₁₊(·w2) left-type count, T total
    * bigram types) are exact integer counts; d = 0.75 is a binary
    * fraction, so every per-bigram double op is correctly rounded on
    * identical inputs, and the per-document reduction sums
    * floor(1e9·P) as exact integers — logprobs are deliberately NOT
    * summed (libm ln per bigram would break the hash contract; the
    * micro-prob sum carries the same ranking signal).
    *
    * Self-scoring means every scored bigram was seen (c12 ≥ 1), so the
    * discounted term needs no max(·,0) clamp. Work: the retained
    * bigram stream aggregates once to the model, which is itself
    * retained to feed its four consumers (probe join, context agg,
    * left-type agg, T) — two corpus-shaped shuffles total, vocab-sized
    * joins after. Output: doc_id, n_bigrams, sum_p_micro. */
  def kneserNeySelfScore(docs: DataFrame, idCol: String, textCol: String,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val docBg = scope.retain(docs
      .select(col(idCol).as("doc_id"),
        explode(bigramPairs(col(textCol))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2")))
    val m = scope.retain(
      docBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    val ctx = m.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("r1"))
    val left = m.groupBy(col("w2")).agg(count(lit(1)).as("l2"))
    val types = m.agg(count(lit(1)).as("t"))
    val p =
      (col("c12").cast("double") - lit(0.75)) / col("c1").cast("double") +
        lit(0.75) * col("r1").cast("double") / col("c1").cast("double") *
          (col("l2").cast("double") / col("t").cast("double"))
    docBg
      .join(m, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(left, Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("p_micro", floor(p * lit(1e9)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_micro")).as("sum_p_micro"))
  }
}
