package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.TextFunctions

/** Collocation mining by pointwise mutual information — rank adjacent
  * token pairs by how much more often they co-occur than their
  * unigram frequencies predict: pmi = ln(c12 * N / (c1 * c2)), the
  * classic Church–Hanks association measure. High-PMI pairs are the
  * corpus's multi-word units ("new york", "machine learning") — the
  * phrase inventory a tokenizer or n-gram blacklist is built from.
  *
  * Shape at scale: the token stream is aggregated twice from one
  * retained scan — a (w1,w2)-keyed pair count and a token-keyed unigram
  * count; the pair table is pruned by `minPairCount` BEFORE the unigram
  * joins (heavy-tail cut — the joins only carry pairs that can rank).
  * Both count tables are vocabulary-sized and therefore joined on the
  * token key, never broadcast (TfIdf/[[NgramLm]] design rule); total
  * token mass N enters as a broadcast one-row aggregate. The final
  * top-k is orderBy+limit (TakeOrdered — per-partition heaps, no
  * global sort), with the ln-based score rounded into DECIMAL(20,12) so
  * ranking is reproducible across engines; the compared output is the
  * integer count profile plus the ranking, [[Bm25]]'s rule.
  */
object Cooccurrence {

  /** (rank, w1, w2, c12, c1, c2, pmi): top `topK` adjacent pairs with
    * corpus count >= `minPairCount`, ranked by PMI descending with a
    * (w1, w2) tiebreak. c1/c2 are unigram occurrence counts over the
    * SAME normalized token stream the pairs come from. */
  def pmi(docs: DataFrame, textCol: String, minPairCount: Long = 2L,
      topK: Int = 100,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // one scan feeds both count tables
    val toks = scope.retain(docs.select(
      split(TextFunctions.normalize(col(textCol)), " ").as("__a")))
    val uni = toks.select(explode(col("__a")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = toks
      .select(explode(NgramLm.bigramsOfTokens(col("__a"))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minPairCount)
    val total = uni.agg(sum(col("c")).as("n"))
    val scored = pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("pmi",
        log(col("c12").cast("double") * col("n").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double")))
          .cast("decimal(20,12)"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
    // rank epilogue over <= topK rows (Bm25's window-after-limit rule)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
    scored.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("w1"), col("w2"), col("c12"), col("c1"),
        col("c2"), col("pmi").cast("double").as("pmi"))
  }
}
