package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.dedup.Dedup

/** Corpus-common n-gram ("boilerplate") detection — the curation signal
  * behind C4-style filtering: documents dominated by n-grams that recur
  * across many OTHER documents are templates/boilerplate, not content.
  *
  * Relational shape: the distinct (doc, shingle) table is aggregated
  * once into corpus document frequencies, then joined back — two
  * shuffles on the shingle key, map-side partials throughout, nothing
  * driver-side or broadcast (the df table scales with the corpus
  * vocabulary). Output is integer-exact (counts + ppm) so thresholds
  * stay caller-side and results are engine-portable.
  */
object Boilerplate {

  /** Per-document boilerplate stats: n_shingles (distinct n-grams),
    * n_common (those with corpus df > dfThreshold), common_ppm.
    * Documents with fewer than n words have no shingles and are absent
    * (nothing to rate). */
  def stats(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, dfThreshold: Long,
      scope: CacheScope = CacheScope.session): DataFrame = {
    // persisted: the shingle table feeds BOTH the df aggregation and the
    // join probe — without it the whole scan+explode+distinct pipeline
    // runs twice. `scope` owns the release (see CacheScope).
    val sh = scope.retain(Dedup.shingleTable(docs, idCol, textCol, n))
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    sh.join(df, "shingle")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") > dfThreshold, 1L).otherwise(0L)).as("n_common"))
      .withColumn("common_ppm", expr("n_common * 1000000L div n_shingles"))
  }

  /** Train/eval contamination: per TRAIN document, how many of its
    * distinct n-grams also occur anywhere in the EVAL corpus — the
    * decontamination signal (drop or flag training documents that leak
    * benchmark content). Same two-shuffle shape as [[stats]]: the eval
    * shingle set is a distinct relational table joined on the shingle
    * key, never a broadcast/driver-side set, so the eval corpus can be
    * arbitrarily large. */
  def contamination(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val trainSh = Dedup.shingleTable(train, idCol, textCol, n)
    val evalSh = Dedup.shingleTable(eval, idCol, textCol, n)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1L))
    trainSh.join(evalSh, Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contaminated_ppm",
        expr("n_contaminated * 1000000L div n_shingles"))
  }
}
