package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TextRank keyword extraction (Mihalcea & Tarau 2004, public paper):
  * rank corpus vocabulary by PageRank over the word-adjacency graph —
  * tokens that co-occur next to many well-connected tokens surface as
  * keywords. A pure COMPOSITION of shipped machinery: the
  * [[NgramLm]]/[[TfIdf]] tokenization builds the graph, and
  * [[PageRank.run]]'s 2^48 fixed-point rounds rank it, so the oracle
  * replay is the proven q_pagerank round chain over a bigram CTE.
  *
  * Graph convention: undirected (both directions materialized),
  * DISTINCT adjacent-token pairs (classic TextRank's window-2
  * unweighted form; self-loops dropped). Top-k is deterministic:
  * row_number over (rank DESC, token ASC) on the engine-identical
  * fixed-point scores.
  *
  * Scale shape: one corpus tokenization → one (w1,w2) distinct
  * aggregate (vocabulary²-bounded, corpus-sized shuffle once) → the
  * PageRank rounds run on the vocabulary-sized graph, independent of
  * corpus volume. */
object TextRank {

  def keywords(docs: DataFrame, textCol: String, iters: Int = 3,
      topK: Int = 25, damping: Double = 0.85): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks: Column = split(TextFunctions.normalize(col(textCol)), " ")
    val pairs = docs
      .filter(col(textCol).isNotNull)
      .select(explode(NgramLm.bigramsOfTokens(toks)).as("bg"))
      .select(col("bg.w1").as("a"), col("bg.w2").as("b"))
      .filter(col("a") =!= "" && col("b") =!= "" && col("a") =!= col("b"))
      .distinct()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
    val ranked = PageRank.run(edges, "src", "dst", iters, damping)
    val w = Window.orderBy(col("rank").desc, col("node").asc)
    ranked.withColumn("pos", row_number().over(w))
      .filter(col("pos") <= topK)
      .select(col("pos").cast("long").as("pos"),
        col("node").as("token"), col("rank"))
  }
}
