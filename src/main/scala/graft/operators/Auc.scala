package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation: exact tie-aware ROC AUC per model key,
  * in INTEGER arithmetic end to end.
  *
  * AUC equals the Mann-Whitney statistic: with R⁺ the sum of midranks
  * of the positives, AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻). Ties are
  * handled by midranks, and a tied block of size m whose c predecessors
  * rank lower contributes np_block·(2c+m+1) to 2R⁺ — an INTEGER, so the
  * whole statistic is exact integer arithmetic until one final fixed-
  * point division (ppm). No doubles anywhere: two engines can only
  * agree or be wrong.
  *
  * Scale shape: one groupBy collapses the corpus to (key, score) blocks
  * — the per-row sort this family usually costs never happens. The
  * window runs over DISTINCT SCORES per key, so the contract is the
  * [[Stats.ksStatistic]] one: quantize/bucket continuous scores
  * upstream (a score histogram is how AUC is computed at 100 TB anyway;
  * a 10-bit quantization bounds the window at 1024 rows per key and
  * biases AUC by at most the bucket mass). Unbounded-cardinality raw
  * doubles would make the window a single-task sort — bin them first.
  */
object Auc {

  /** Per-key AUC of `scoreCol` ranking `labelCol` (must be 0/1).
    * Output: key, n_pos, n_neg, auc_ppm (floor fixed-point; null when
    * either class is empty — AUC is undefined, not 0.5). */
  def aucByKey(df: DataFrame, keyCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocks = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(keyCol), col(scoreCol)).agg(
        sum(col(labelCol).cast("long")).as("np"),
        sum(lit(1L) - col(labelCol).cast("long")).as("nn"))
      .withColumn("m", col("np") + col("nn"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(scoreCol))
    blocks
      // rows ranked strictly below this score block
      .withColumn("cb", sum(col("m")).over(w) - col("m"))
      .groupBy(col(keyCol)).agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        // 2·R⁺: midrank of a tied block is cb + (m+1)/2, doubled to
        // stay integral
        sum(col("np") * (lit(2L) * col("cb") + col("m") + lit(1L)))
          .as("r2"))
      .select(col(keyCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr("((r2 - n_pos * (n_pos + 1L)) * 1000000L)" +
            " div (2L * n_pos * n_neg)")).as("auc_ppm"))
  }
}
