package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Repetition signals for training-data quality filtering (the classic
  * "repetitious documents are low quality" heuristics: type-token ratio
  * and most-frequent-unigram / most-frequent-bigram dominance).
  *
  * All outputs are exact integers — counts and a parts-per-million ratio
  * via integer division — so results are engine- and partitioning-
  * independent (no float thresholds baked in; callers apply cutoffs).
  *
  * Shuffle shape: two explode + hash-aggregate passes (unigrams, bigrams)
  * keyed by (doc, gram) then doc — map-side partial counts do the heavy
  * lifting; aggregate state is bounded by per-doc vocabulary, never the
  * corpus. The final join is doc-keyed and co-partitioned with the
  * aggregates, so at scale this is two shuffles over gram-count rows and
  * nothing driver-side.
  */
object RepetitionStats {

  /** Per-document: n_words, n_distinct (vocabulary), top_word_cnt,
    * top_bigram_cnt, top_word_ppm (= top_word_cnt * 1e6 / n_words,
    * integer-exact). Empty documents are excluded (no tokens to rate). */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs
      .select(col(idCol), split(TextFunctions.normalize(col(textCol)), " ").as("ws"))
      .filter(size(col("ws")) > 0 && col("ws")(0) =!= "")

    val uni = words.select(col(idCol), explode(col("ws")).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol)).agg(
        sum(col("cnt")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_word_cnt"))

    val bi = words
      .select(col(idCol), explode(TextFunctions.wordShingles("ws", 2)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol)).agg(max(col("cnt")).as("top_bigram_cnt"))

    uni.join(bi, idCol)
      .withColumn("top_word_ppm",
        expr("top_word_cnt * 1000000L div n_words"))
  }
}
