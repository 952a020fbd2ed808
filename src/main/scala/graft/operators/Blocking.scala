package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocking-scheme evaluation (Christen 2012's reduction ratio / pairs
  * completeness): the numbers an entity-resolution pipeline reads
  * before TRUSTING a candidate screen — how much of the quadratic pair
  * space the blocker prunes (reduction) and how many true matches
  * survive the pruning (completeness, the screen's recall). The repo's
  * screens prove losslessness on specific corpora (deletion-
  * neighborhood ≡ brute force); this operator is how a LOSSY blocker
  * (prefix keys, length bands, LSH at aggressive thresholds) is graded
  * against ground truth on a sample.
  *
  * All-integer outputs: counts, plus reduction/completeness in ppm via
  * integral division (DECIMAL-widened where n_all_pairs ~ n²/2 can
  * push the 1e6-scaled numerator past a long). One count aggregate per
  * input, a semi join of truth against candidates, one-row broadcast
  * crosses — nothing corpus-sized moves.
  */
object Blocking {

  /** @param records    the record set being linked (row count = n)
    * @param candidates blocker output pairs (aCol < bCol canonical)
    * @param truth      ground-truth matching pairs (same canon)
    * Output (one row): n_records, n_all_pairs = n(n-1)/2, n_candidates,
    * n_truth, n_found (= |truth ∩ candidates|), reduction_ppm
    * (null when n < 2), completeness_ppm (null when truth is empty). */
  def quality(records: DataFrame, candidates: DataFrame, truth: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val cand = candidates.select(col(aCol).as("a"), col(bCol).as("b"))
      .distinct()
    val tr = truth.select(col(aCol).as("a"), col(bCol).as("b")).distinct()
    val n = records.agg(count(lit(1)).as("n_records"))
    val nc = cand.agg(count(lit(1)).as("n_candidates"))
    val nt = tr.agg(count(lit(1)).as("n_truth"))
    val nf = tr.join(cand, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_found"))
    n.crossJoin(broadcast(nc)).crossJoin(broadcast(nt))
      .crossJoin(broadcast(nf))
      .withColumn("n_all_pairs",
        expr("n_records * (n_records - 1) div 2"))
      .withColumn("reduction_ppm",
        when(col("n_all_pairs") > 0,
          expr("""(CAST(1000000 AS DECIMAL(38,0))
                  * (n_all_pairs - n_candidates)) div n_all_pairs""")))
      .withColumn("completeness_ppm",
        when(col("n_truth") > 0,
          expr("1000000L * n_found div n_truth")))
      .select(col("n_records"), col("n_all_pairs"), col("n_candidates"),
        col("n_truth"), col("n_found"), col("reduction_ppm"),
        col("completeness_ppm"))
  }
}
