package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbor label prediction over an embedding column: the
  * classification face of [[CosineSearch]] — "label this vector by
  * majority vote of its neighbors", the weak-labeling / label-spreading
  * primitive of embedding-space curation (nearest-neighbor quality
  * transfer, cluster label propagation).
  *
  * [[predictBruteForce]] composes the documented brute-force top-k
  * baseline (exact, crossJoin — the recall yardstick; queries must be
  * a bounded probe set). The SCALE path is [[vote]] over
  * [[CosineSearch.ivfTopK]]'s centroid-bucketed neighbors — same vote,
  * sub-linear candidate generation.
  *
  * Determinism: votes are integer counts; ties break toward the
  * smallest label (row_number over (votes DESC, label ASC) — exact,
  * oracle-replayable). */
object KnnClassify {

  /** Majority vote over an already-computed neighbor table
    * (query_id, nn_id, …) — join the corpus labels, count, argmax.
    * One neighbor-keyed shuffle join + one (query, label) aggregate. */
  def vote(neighbors: DataFrame, labels: DataFrame, idCol: String,
      labelCol: String): DataFrame = {
    val lab = labels.select(col(idCol).as("nn_id"),
      col(labelCol).as("pred_label"))
    val votes = neighbors.join(lab, Seq("nn_id"))
      .groupBy(col("query_id"), col("pred_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("pred_label").asc)
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("pred_label"), col("votes"))
  }

  /** Exact kNN classification of `queries` against `corpus` (both
    * carrying `labelCol`): brute-force cosine top-k then [[vote]].
    * The query's own row never votes (bruteForceTopK excludes self). */
  def predictBruteForce(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int): DataFrame =
    vote(CosineSearch.bruteForceTopK(corpus, queries, idCol, vecCol, k),
      corpus, idCol, labelCol)
}
