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

  /** Position-discount weights 1/log2(i+1) for i = 1..k, computed ONCE
    * here so the Spark plan and a SQL oracle can share bit-identical
    * literals (an engine's own log2 may differ in the last ulp). */
  def ndcgWeights(k: Int): Seq[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** NDCG@k with graded relevance (Järvelin & Kekäläinen 2002, linear
    * gain): per query, DCG@k = Σ_i rel_at_rank_i / log2(i+1) against
    * the ideal ordering's IDCG. Engine-exact shape: the per-position
    * relevances collapse to k integer conditional sums, and both DCG
    * and IDCG are the same FIXED left-associated k-term chain over
    * those integers and the shared [[ndcgWeights]] literals — no
    * order-dependent double accumulation anywhere.
    *
    * `ranking` is a (query, id, rank) table (the recallAtK shape);
    * `relevance` holds integer grades (query, id, rel >= 0) — ids
    * missing from it count rel 0; queries without any relevant id get
    * a null ndcg (IDCG = 0). The ideal ordering ties deterministically
    * on (rel DESC, id). Output: (queryCol, dcg, idcg, ndcg). */
  def ndcgAtK(ranking: DataFrame, relevance: DataFrame,
      queryCol: String, idCol: String, rankCol: String, relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val w = ndcgWeights(k)
    def chain(prefix: String) =
      w.zipWithIndex.map { case (wi, i) =>
        col(s"$prefix${i + 1}").cast("double") * lit(wi)
      }.reduce(_ + _)

    val rel = relevance.select(col(queryCol), col(idCol),
      col(relCol).cast("long").as("__rel"))
    val actual = ranking.filter(col(rankCol) <= k)
      .select(col(queryCol), col(idCol), col(rankCol).as("__rank"))
      .join(rel, Seq(queryCol, idCol), "left")
      .withColumn("__rel0", coalesce(col("__rel"), lit(0L)))
      .groupBy(col(queryCol))
      .agg(w.indices.map { i =>
        sum(when(col("__rank") === (i + 1), col("__rel0")).otherwise(0L))
          .as(s"__s${i + 1}")
      }.head, w.indices.tail.map { i =>
        sum(when(col("__rank") === (i + 1), col("__rel0")).otherwise(0L))
          .as(s"__s${i + 1}")
      }: _*)

    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol))
      .orderBy(col("__rel").desc, col(idCol))
    val ideal = rel.filter(col("__rel") > 0)
      .withColumn("__irank", row_number().over(wIdeal))
      .filter(col("__irank") <= k)
      .groupBy(col(queryCol))
      .agg(w.indices.map { i =>
        sum(when(col("__irank") === (i + 1), col("__rel")).otherwise(0L))
          .as(s"__t${i + 1}")
      }.head, w.indices.tail.map { i =>
        sum(when(col("__irank") === (i + 1), col("__rel")).otherwise(0L))
          .as(s"__t${i + 1}")
      }: _*)

    actual.join(ideal, Seq(queryCol), "left")
      .withColumn("dcg", chain("__s"))
      .withColumn("idcg", chain("__t"))
      .select(col(queryCol), col("dcg"), col("idcg"),
        when(col("idcg") > 0.0, col("dcg") / col("idcg")).as("ndcg"))
  }

  /** Average Precision at k (binary relevance; the per-query summand of
    * MAP): AP@k = Σ_{i ≤ k, hit at i} P@i / min(R, k), with
    * P@i = hits-so-far / i and R the query's total relevant count.
    *
    * ENGINE-EXACT in MICRO units: every precision term is one integral
    * division `(1e6 · cum_hits) div i` (longs — i ≤ k, cum_hits ≤ k,
    * no widening needed), the numerator is an integer sum of those
    * terms, and `ap_ppm` is one more integral division by min(R, k) —
    * all operands non-negative, so `div` (truncate) and `//` (floor)
    * agree and the table hash-compares across engines.
    *
    * `ranking` is (query, id, rank) with rank 1-based and deterministic
    * (the recallAtK shape); `relevance` rows with rel > 0 mark the
    * relevant ids. Plan shape: the running-hit window sorts ≤ k rows
    * per query (rank ≤ k is filtered BEFORE the window), then one
    * aggregate — bounded by k regardless of corpus size. Output:
    * (queryCol, r_total, hits, ap_num_micro, ap_ppm — null when the
    * query has no relevant ids). */
  def averagePrecisionAtK(ranking: DataFrame, relevance: DataFrame,
      queryCol: String, idCol: String, rankCol: String, relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val rel = relevance.filter(col(relCol) > 0)
      .select(col(queryCol), col(idCol))
    val rTot = rel.groupBy(col(queryCol))
      .agg(count(lit(1)).as("r_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol)).orderBy(col("__rank"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val scored = ranking.filter(col(rankCol) <= k)
      .select(col(queryCol), col(idCol), col(rankCol).as("__rank"))
      .join(rel.withColumn("__hit", lit(1L)), Seq(queryCol, idCol), "left")
      .withColumn("__hit0", coalesce(col("__hit"), lit(0L)))
      .withColumn("__cum", sum(col("__hit0")).over(w))
      .withColumn("__term",
        when(col("__hit0") === 1L,
          expr("(1000000 * __cum) div __rank")).otherwise(lit(0L)))
    scored.groupBy(col(queryCol))
      .agg(sum(col("__hit0")).as("hits"),
        sum(col("__term")).as("ap_num_micro"))
      .join(rTot, Seq(queryCol), "left")
      .select(col(queryCol), coalesce(col("r_total"), lit(0L)).as("r_total"),
        col("hits"), col("ap_num_micro"),
        when(coalesce(col("r_total"), lit(0L)) > 0,
          expr(s"ap_num_micro div least(r_total, ${k}L)")).as("ap_ppm"))
  }
}
