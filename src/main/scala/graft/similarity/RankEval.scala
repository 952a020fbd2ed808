package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — the harness that turns "is the ANN index
  * good enough?" into a number: recall@k of a candidate ranking against
  * a reference ranking (IVF vs brute force, LSH vs exact, a cheap
  * reranker vs the full model), per query.
  *
  * Both inputs are ranking TABLES (query, id, rank) — the shape every
  * top-k operator in graft.similarity already emits — so evaluation is
  * one semi-join + per-query count: `|top_k(A) ∩ top_k(B)| / k`.
  * Queries present in A but missing from B score 0, not NaN, and
  * queries absent from A are absent from the output (nothing was
  * retrieved to evaluate). The division is one fixed-shape double op
  * over exact counts — engine-reproducible.
  */
object RankEval {

  def recallAtK(candidate: DataFrame, reference: DataFrame,
      queryCol: String, idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val cTop = candidate.filter(col(rankCol) <= k)
      .select(col(queryCol), col(idCol))
    val rTop = reference.filter(col(rankCol) <= k)
      .select(col(queryCol), col(idCol))
    val hits = cTop.join(rTop, Seq(queryCol, idCol), "left_semi")
      .groupBy(col(queryCol)).agg(count(lit(1)).as("__hits"))
    cTop.select(col(queryCol)).distinct()
      .join(hits, Seq(queryCol), "left")
      .select(col(queryCol),
        (coalesce(col("__hits"), lit(0L)).cast("double") /
          lit(k.toDouble)).as("recall"))
  }
}
