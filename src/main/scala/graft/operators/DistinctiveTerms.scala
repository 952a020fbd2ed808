package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-group distinctive terms — the cluster-labeling step (BERTopic's
  * c-TF-IDF idea) that names a cluster / language / source by the terms
  * its documents use far more than the rest of the corpus does.
  *
  * Score: `tf_group · n_groups / groups_with_term` — the c-TF-IDF shape
  * with the log dropped. The log is monotone, so per-group RANKINGS are
  * unchanged, and dropping it keeps the score a fixed-shape double ratio
  * of exact counts (libm log is not correctly rounded, which would break
  * engine-reproducibility; see Stats for the same contract).
  *
  * Shape: one tokenize+explode pass → (group, term) counts (the only
  * corpus-sized shuffle) → term group-frequencies and the group count
  * aggregate off that vocabulary-sized table → per-group top-k window
  * over the vocabulary, never the corpus.
  */
object DistinctiveTerms {

  /** (group, term, tf, gf, score, rank ≤ k); ties rank by term. Terms
    * shorter than `minTermLen` (stopword-ish debris) are dropped. */
  def topTerms(docs: DataFrame, groupCol: String, textCol: String,
      k: Int, minTermLen: Int = 3): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val terms = docs
      .filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol),
        explode(split(TextFunctions.normalize(col(textCol)), " "))
          .as("term"))
      .filter(length(col("term")) >= minTermLen)
    val tf = terms.groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val gf = tf.groupBy(col("term")).agg(count(lit(1)).as("gf"))
    val ng = tf.agg(count_distinct(col(groupCol)).as("ng"))
    val scored = tf
      .join(gf, "term")
      .crossJoin(broadcast(ng))
      .withColumn("score",
        col("tf").cast("double") * col("ng").cast("double") /
          col("gf").cast("double"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("term"), col("tf"), col("gf"),
        col("score"), col("rank"))
  }
}
