package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack et al., SIGIR'09) — the standard
  * score-free combiner for heterogeneous rankings: each system
  * contributes `1/(k0 + rank)`; summing over systems rewards items
  * ranked well anywhere without ever comparing incomparable scores
  * (BM25 vs cosine vs recency). The fusion step retrieval pipelines run
  * between candidate generation and any expensive reranker.
  *
  * Exactness: ranks are integers, each reciprocal is one correctly-
  * rounded double division, and the cross-system sum is written as a
  * FIXED-SHAPE left-associated addition over the pivoted per-system
  * columns (never a SUM aggregate over doubles, whose reduction order
  * is partition-dependent) — so fused scores are engine-reproducible
  * bit-for-bit. Items missing from a system contribute 0 (the standard
  * convention).
  *
  * Work: one full-outer id alignment of the (bounded, top-N sized)
  * ranking tables + one sort of the fused candidates.
  */
object RankFusion {

  /** Fuse per-system rank tables (each: idCol, rankCol with dense
    * 1-based ranks) into (id, rrf_score, fused_rank), keeping `topK`.
    * `k0` is the standard dampening constant (60). */
  def rrf(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.size >= 2, "fusion needs at least two rankings")
    require(topK >= 1 && k0 >= 0, s"bad topK=$topK k0=$k0")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), col(rankCol).cast("long").as(s"__r$i"))
    }
    val aligned = tagged.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val contribs: Seq[Column] = rankings.indices.map(i =>
      when(col(s"__r$i").isNotNull,
        lit(1.0) / (lit(k0.toDouble) + col(s"__r$i").cast("double")))
        .otherwise(lit(0.0)))
    val score = contribs.reduce(_ + _) // fixed shape, system order
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    aligned.select(col(idCol), score.as("rrf_score"))
      .withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topK)
  }
}
