package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.TextFunctions

/** BM25 ranked retrieval — score every document against a bag of query
  * terms and keep the top k (the probabilistic-relevance ranking behind
  * Lucene/Elasticsearch; public Robertson/Zaragoza formulation with
  * Lucene's always-positive idf = ln(1 + (N - df + 0.5) / (df + 0.5))).
  *
  * Shape at scale: the exploded token stream is filtered to the query
  * vocabulary BEFORE any shuffle, so the (doc, term) aggregation only
  * ever carries matching tokens; the df table is bounded by
  * |queryTerms| (broadcast by construction); corpus N / total document
  * length enter as a broadcast one-row aggregate; and the final top-k is
  * orderBy+limit, which Spark executes as TakeOrdered (per-partition
  * heaps, no global sort exchange). The per-term scores are summed in
  * DECIMAL so the float addition order cannot perturb the ranking.
  * Only documents containing at least one query term appear (BM25 of a
  * non-matching document is 0 — retrieval keeps candidates only).
  */
object Bm25 {

  /** (rank, doc_id, n_terms, sum_tf, score): top `topK` documents for
    * `queryTerms`, ranked by BM25 descending with a document-id
    * tiebreak. n_terms/sum_tf are the integer match profile (distinct
    * query terms hit / total occurrences) — engine-exact where the
    * ln-based score is not. */
  def search(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int, k1: Double = 1.2,
      b: Double = 0.75,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val docTok = tokenize(docs, idCol, textCol, scope)
    val matched = docTok
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val scored = scoreTerms(docTok, matched, k1, b)
    // rank via a window AFTER the limit: its input is bounded by topK
    // rows, so the single-partition window is a constant-size epilogue,
    // not a corpus-wide sort
    val ranked = scored.groupBy(col("doc_id"))
      .agg(sum(col("s_term")).as("sd"), count(lit(1)).as("n_terms"),
        sum(col("tf")).as("sum_tf"))
      .orderBy(col("sd").desc, col("doc_id"))
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sd").desc, col("doc_id"))
    ranked.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), col("n_terms"), col("sum_tf"),
        col("sd").cast("double").as("score"))
  }

  /** Batch retrieval: every query in `queries` (query_id, term rows —
    * a bounded table, broadcast) answered in ONE corpus pass. The token
    * stream is semi-joined against the combined query vocabulary before
    * any shuffle, per-term statistics are computed once and shared
    * across queries, and the per-query top-k is a window partitioned by
    * query_id — the scale form when a retrieval workload has thousands
    * of standing queries. Output adds query_id; ranking and the integer
    * match profile per query, same contract as [[search]]. */
  def searchMany(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String, topK: Int,
      k1: Double = 1.2, b: Double = 0.75,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // distinct: a duplicated (query_id, term) row must not double that
    // term's contribution (search's isin dedups the same way)
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(termCol).as("term")).distinct()
    val docTok = tokenize(docs, idCol, textCol, scope)
    val matched = docTok
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(q.select(col("term")).distinct()), Seq("term"),
        "left_semi")
    val scored = scoreTerms(docTok, matched, k1, b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sd").desc, col("doc_id"))
    scored.join(broadcast(q), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s_term")).as("sd"), count(lit(1)).as("n_terms"),
        sum(col("tf")).as("sum_tf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms"),
        col("sum_tf"), col("sd").cast("double").as("score"))
  }

  /** (doc_id, dl, toks) — retained: it feeds both the match stream and
    * the corpus stats, so the scan+normalize pipeline runs once. */
  private def tokenize(docs: DataFrame, idCol: String, textCol: String,
      scope: CacheScope): DataFrame = {
    val norm = TextFunctions.normalize(col(textCol))
    scope.retain(docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokenCountCollapsed(norm).as("dl"),
      split(norm, " ").as("toks")))
  }

  /** Per-(doc, term) BM25 partial scores over a pre-filtered match
    * stream: df per term (bounded by the query vocabulary, broadcast),
    * corpus stats as a one-row broadcast, s_term rounded into DECIMAL
    * so the per-document sum is order-independent. */
  private def scoreTerms(docTok: DataFrame, matched: DataFrame,
      k1: Double, b: Double): DataFrame = {
    val tf = matched.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf is unique per (doc, term), so df is a plain count — bounded by
    // the query vocabulary, hence broadcast
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docTok.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      // b*dl/avgdl is written as ((b*dl)*N)/sum_dl: integer inputs and a
      // fixed association order keep the doubles engine-identical
      .withColumn("tfn",
        col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") * col("n_docs").cast("double") /
                col("sum_dl").cast("double"))))
      .withColumn("s_term", (col("idf") * col("tfn")).cast("decimal(20,12)"))
  }
}
