package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-biased overlap between two top-k rankings per key (Webber,
  * Moffat & Zobel 2010, "A Similarity Measure for Indefinite
  * Rankings") — the top-weighted agreement readout the flat measures
  * miss (Kendall/Spearman weight rank 1 and rank 1000 equally; RBO's
  * geometric weights make disagreement at the top cost more):
  *
  *   RBO@k = (1 − p) Σ_{d=1..k} p^{d−1} · |A_{1..d} ∩ B_{1..d}| / d
  *
  * (the truncated prefix form — no extrapolation term; compare equal
  * k on both sides). The standard "did the cheap ranker agree with the
  * expensive one where it matters" gate for ANN/BM25/feature-ranking
  * swaps.
  *
  * Exactness: the geometric weights are computed ONCE as exact scaled
  * integers w_d = trunc(1e12·p^{d−1}) and embedded as literals in both
  * engines (p^{d−1} is exact at scale 12 for d ≤ 13); each depth term
  * quantizes through the exact integral division
  * trunc(w_d · ov_d ÷ d) (DECIMAL(38,0) intermediates), so the per-key
  * sum is an exact integer and the single closing double division is
  * engine-portable bit for bit.
  *
  * Shape: one (key, id) equi-join of the two rank tables, one bounded
  * (key × k) grid with a running count — never |corpus|², and the
  * grid side is broadcast-sized. Contract: ranks are 1..k, one row
  * per (key, id) per side; k ≤ 25 (weight-product headroom). */
object RankOverlap {

  /** Inputs: two rank tables (keyCol, idCol, rankCol with ranks 1..k).
    * Output: (keyCol, rbo_p12 — the exact Σ trunc(w_d·ov_d/d) integer,
    * rbo — the (1−p)-scaled double). Keys present in either input
    * appear; disjoint top-k lists read 0.0. */
  def rboTruncated(a: DataFrame, b: DataFrame, keyCol: String,
      idCol: String, rankCol: String, k: Int,
      p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 25, s"k in [1, 25], got $k")
    require(p > 0.0 && p < 1.0, s"p in (0,1), got $p")
    // exact scaled weights, shared literals on both engines
    val w12 = weights12(k, p)
    val ra = a.select(col(keyCol), col(idCol),
      col(rankCol).cast("long").as("__ra"))
    val rb = b.select(col(keyCol), col(idCol),
      col(rankCol).cast("long").as("__rb"))
    // an id in both prefixes first counts at depth max(ra, rb)
    val m = ra.join(rb, Seq(keyCol, idCol))
      .select(col(keyCol), greatest(col("__ra"), col("__rb")).as("__m"))
      .filter(col("__m") <= k)
    val keys = ra.select(col(keyCol))
      .union(rb.select(col(keyCol))).distinct()
    // ov_d per key: how many shared ids have max-rank <= d — the
    // (key x k) grid with a conditional count; grid is k-bounded
    val grid = keys.select(col(keyCol),
      explode(sequence(lit(1), lit(k))).as("__d"))
    val ov = grid.join(m, Seq(keyCol), "left")
      .groupBy(col(keyCol), col("__d"))
      .agg(sum(when(col("__m") <= col("__d"), 1L).otherwise(0L)).as("__ov"))
    // t_d = trunc(w_d * ov_d / d), exact integral division
    val w = element_at(
      array(w12.map(lit): _*), col("__d").cast("int"))
    val num = (w.cast("decimal(38,0)") * col("__ov").cast("decimal(38,0)"))
    val t = ((num - num % col("__d")) / col("__d"))
      .cast("decimal(38,0)").cast("long")
    ov.select(col(keyCol), t.as("__t"))
      .groupBy(col(keyCol))
      .agg(sum(col("__t")).as("rbo_p12"))
      .select(col(keyCol), col("rbo_p12"),
        (col("rbo_p12").cast("double") / lit(1.0e12) * lit(1.0 - p))
          .as("rbo"))
  }

  /** trunc(1e12 · p^{d−1}) for d = 1..k — exact for p = a/10 up to
    * d = 13, shared verbatim with oracle SQL. */
  def weights12(k: Int, p: Double): Seq[Long] = {
    val pd = BigDecimal(p)
    (1 to k).map(d =>
      (pd.pow(d - 1) * BigDecimal(1000000000000L))
        .setScale(0, BigDecimal.RoundingMode.DOWN).toLongExact)
  }
}
