package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Vocabulary coverage: what fraction of a corpus' tokens would a
  * frequency-cut vocabulary miss?
  *
  * The standard pre-tokenizer question (SentencePiece/BPE sizing,
  * coverage reports in the T5/PaLM data cards): build the vocabulary as
  * "every token with corpus frequency ≥ minCount", then report per-group
  * token totals and the out-of-vocabulary fraction. A rising OOV rate
  * on a new source is the cheapest drift alarm a tokenizer owner has.
  *
  * Scale shape: one explode over the corpus (the same token table every
  * other lexical operator derives), one groupBy(token) for the counts,
  * then a token-keyed equi-join of per-group counts against the
  * vocabulary — all partial-aggregated shuffles on bounded-cardinality
  * keys. The vocabulary is NOT broadcast: its size is corpus-dependent
  * and unbounded at 100 TB, so the join stays a shuffle join and AQE may
  * still choose to broadcast it when it turns out small.
  */
object TokenCoverage {

  /** Per-`groupCol` coverage report: n_tokens, n_oov, oov_rate (double).
    * Tokens are the whitespace tokens of the collapsed, lower-cased
    * `textCol` (TextFunctions.normalize — the library's shared lexical
    * convention). */
  def oovReport(
      df: DataFrame, groupCol: String, textCol: String,
      minCount: Long): DataFrame = {
    val toks = df
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(split(TextFunctions.normalize(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val perGroup = toks.groupBy(col("g"), col("term"))
      .agg(count(lit(1)).as("c_gt"))
    val vocab = perGroup.groupBy(col("term"))
      .agg(sum(col("c_gt")).as("c_t"))
      .filter(col("c_t") >= minCount)
      .select(col("term"))
    perGroup
      .join(vocab.withColumn("__in", lit(1L)), Seq("term"), "left")
      .groupBy(col("g"))
      .agg(
        sum(col("c_gt")).as("n_tokens"),
        sum(when(col("__in").isNull, col("c_gt")).otherwise(lit(0L)))
          .as("n_oov"))
      .select(
        col("g").as(groupCol),
        col("n_tokens"),
        col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }
}
