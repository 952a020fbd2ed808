package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.dedup.ConnectedComponents

/** SemDeDup — semantic deduplication over an embedding column (Abbas et
  * al. 2023, public paper): embeddings are clustered, near-duplicate
  * pairs are detected WITHIN clusters only, duplicate groups are closed
  * transitively, and one representative per group is kept — the paper's
  * rule keeps the example FARTHEST from its cluster centroid (lowest
  * centroid similarity), which preferentially retains the less-typical
  * copy and discards redundant near-center mass.
  *
  * Composition of existing scale paths, nothing new to shuffle-audit:
  * [[CosineSearch.ivfAssign]] (map-side centroid assignment) →
  * [[CosineSearch.pairsFromAssigned]] (bucketed |bucket|² pair space,
  * screen-then-rescore) → [[ConnectedComponents.labels]] (alternating
  * large-star/small-star, O(log n) rounds) → one per-cluster window over
  * clustered vectors only. The corpus-sized assignment is computed once
  * and retained; the window runs on duplicate-group members, a vanishing
  * fraction of the corpus at real thresholds.
  */
object SemDedup {

  /** Per-clustered-vector dedup verdict: (idCol, cluster_id,
    * centroid_sim, keep). Vectors in no duplicate group (the vast
    * majority) are absent — they are implicitly kept; [[keepers]] applies
    * that convention. `centroid_sim` is the vector's worst assigned-
    * centroid similarity (= its only one at nProbe = 1); with nProbe > 1
    * the min over probes is used so the keeper rule stays deterministic
    * and engine-reproducible (min skips NULL sentinel scores on both
    * Spark and ANSI engines). */
  def verdicts(
      vecs: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      centroidIdCol: String, threshold: Double, nProbe: Int = 1,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    // feeds both the pair join (twice) and the keeper scoring — retain
    val assigned = scope.retain(
      CosineSearch.ivfAssign(vecs, centroids, idCol, vecCol, centroidIdCol,
        nProbe))
    val pairs =
      CosineSearch.pairsFromAssigned(assigned, idCol, vecCol, threshold, nProbe)
    val labels = ConnectedComponents.labels(pairs, "vec_a", "vec_b")
      .select(col("id").as(idCol), col("cluster_id"))
    // restrict to clustered vectors BEFORE aggregating the per-probe
    // minimum: labels is tiny (duplicate-group members only) and
    // broadcastable, so the corpus-sized assignment never pays a keyed
    // exchange just to score vectors the window will not see
    val memberSims = labels
      .join(assigned.select(col(idCol), col("c_sim")), Seq(idCol))
      .groupBy(col(idCol), col("cluster_id"))
      .agg(min(col("c_sim")).as("centroid_sim"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("centroid_sim").asc_nulls_first, col(idCol))
    memberSims
      .withColumn("keep", row_number().over(w) === 1)
      .select(col(idCol), col("cluster_id"), col("centroid_sim"), col("keep"))
  }

  /** The surviving corpus: every vector not voted out by [[verdicts]] —
    * unclustered vectors plus each duplicate group's keeper. Anti-join
    * on the drop list, so the corpus-sized side is never widened. */
  def keepers(
      vecs: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      centroidIdCol: String, threshold: Double, nProbe: Int = 1,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val dropped = verdicts(vecs, centroids, idCol, vecCol, centroidIdCol,
        threshold, nProbe, scope)
      .filter(!col("keep")).select(col(idCol))
    vecs.join(dropped, Seq(idCol), "left_anti")
  }
}
