package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.TextFunctions

/** Unigram-rarity quality scoring — the integer-exact analogue of the
  * CCNet-style language-model perplexity filter (public paper): a
  * document whose tokens are mostly corpus-rare is likely noise (OCR
  * garbage, codes, boilerplate IDs), one whose tokens are all
  * corpus-common carries little information. Scoring against the
  * corpus's own unigram counts needs no external model and no floating
  * log-probabilities (libm differs across engines; integer counts do
  * not), so the result is bit-reproducible anywhere.
  *
  * Shape at scale: one token-keyed aggregation builds the unigram table,
  * one token-keyed join scores documents against it — both plain
  * shuffles. The vocabulary is unbounded, so the count table is NEVER
  * broadcast (same design rule as TfIdf).
  */
object RareTokens {

  /** Corpus unigram counts: (w, w_count). One shuffle on the token. */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
        explode(split(TextFunctions.collapseWs(col(textCol)), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("w_count"))

  /** Per-document rarity profile: token count, total and minimum corpus
    * frequency of its tokens, tokens rarer than `rareBelow`, and the
    * rare share in ppm — all BIGINT, hash-stable on any engine. */
  def rarity(docs: DataFrame, idCol: String, textCol: String,
      rareBelow: Long, scope: CacheScope = CacheScope.session): DataFrame = {
    // the token table feeds BOTH the unigram aggregation and the join
    // probe — retained so the scan+explode pipeline runs once
    val toks = scope.retain(docs.select(col(idCol),
      explode(split(TextFunctions.collapseWs(col(textCol)), " ")).as("w")))
    toks.join(
        toks.groupBy(col("w")).agg(count(lit(1)).as("w_count")), Seq("w"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("w_count")).as("sum_df"),
        min(col("w_count")).as("min_df"),
        sum(when(col("w_count") < rareBelow, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_ppm",
        expr("CAST(n_rare * 1000000 DIV n_tokens AS BIGINT)"))
  }
}
