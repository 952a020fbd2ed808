package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.DecimalDotExpr
import graft.operators.TopKAggregator

/** Johnson-Lindenstrauss random projection: reduce an embedding column to
  * `rDims` dimensions with seeded Gaussian hyperplanes (the same
  * deterministic plane generator as [[HyperplaneLSH]] — the (rDims, seed,
  * dims) triple is the projection's identity), then run top-k as a cheap
  * reduced-space screen with an EXACT rescore of the survivors.
  *
  * Where it sits among the ANN paths: IVF buckets bound the candidate
  * COUNT; this bounds the candidate COST — each screened pair scores on
  * rDims doubles instead of `dims` floats, and the corpus table shuffled
  * or broadcast for screening carries rDims doubles per row (8x narrower
  * at the 64 -> 8 default). The two compose (project an IVF bucket's
  * candidates) but are independently useful; the JL bound keeps relative
  * distances within (1 ± eps) at rDims = O(log n / eps^2).
  *
  * Scale shape: projection is one map-side pass (codegen'd decimal dots
  * against broadcast plane literals). The screen aggregates with the
  * bounded [[TopKAggregator]] — NOT a row_number window, which would
  * sort the full |queries| x |corpus| fan-out through an exchange (the
  * ivfAssign lesson). Only candK rows per query reach the exact-rescore
  * join.
  *
  * Determinism: reduced values are exact-decimal dots cast to double;
  * reduced similarity uses fixed-shape left-associated arithmetic, so the
  * DuckDB oracle replays bit-equal doubles end to end. Zero-norm rows
  * (all-zero vectors) have no cosine and are excluded from the screen on
  * both engines.
  */
object RandomProjection {

  /** Adds `rvec` (array<double>, length rDims): the exact-decimal
    * projections of `vecCol` onto the seeded planes. Map-side only.
    *
    * Guards the one parameter the caller must get right: a row whose
    * embedding length differs from `dims` raises instead of silently
    * projecting against a prefix of each plane (DecimalDot iterates
    * min(len, dims) — a wrong-answer-not-error shape without the check).
    * NULL embeddings pass through as NULL (DecimalDot null-poisons). */
  def project(vecs: DataFrame, vecCol: String,
      rDims: Int, seed: Long, dims: Int = 64): DataFrame = {
    val ps = HyperplaneLSH.planes(rDims, dims, seed)
    val checked = when(col(vecCol).isNull, col(vecCol))
      .when(size(col(vecCol)) === dims, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"RandomProjection.project: embedding length != dims=$dims (got "),
        size(col(vecCol)).cast("string"), lit(")"))))
    vecs.withColumn("rvec", array(ps.map(p =>
      DecimalDotExpr.decimal_dot(checked, HyperplaneLSH.planeLit(p))
        .cast("double")): _*))
  }

  /** Fixed-shape left-associated dot over two reduced double vectors —
    * the oracle writes the identical expression tree, so IEEE results
    * match bit for bit. */
  private[similarity] def rDot(a: Column, b: Column, rDims: Int): Column =
    (0 until rDims).map(j => a(j) * b(j)).reduce(_ + _)

  /** Top-k nearest corpus vectors per query by exact cosine, screened in
    * reduced space: candK reduced-cosine candidates per query (bounded
    * aggregation), then exact decimal-dot rescore and final rank. With
    * candK >= |corpus| - 1 this IS brute force (the equivalence law the
    * spec pins) — PRECONDITION: the law assumes non-zero-norm vectors.
    * Zero-norm rows have no reduced cosine and are dropped by the screen,
    * while [[CosineSearch.bruteForceTopK]] keeps NULL-cosine candidates
    * ranked last; on a corpus containing zero vectors (or a zero-norm
    * query) this returns fewer rows than brute force once non-zero
    * candidates run out. Smaller candK trades recall for an
    * (dims/rDims)x cheaper screen. Output: (query_id, rank, nn_id,
    * cos_sim). */
  def topKViaProjection(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, candK: Int, rDims: Int, seed: Long, dims: Int = 64,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(k >= 1 && candK >= k, s"need candK >= k >= 1, got k=$k candK=$candK")
    val c = scope.retain(
      project(CosineSearch.withNormSq(corpus, vecCol), vecCol, rDims, seed, dims)
        .select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
          col("norm_sq").as("nn_norm_sq"), col("rvec").as("nn_rvec"),
          sqrt(rDot(col("rvec"), col("rvec"), rDims)).as("nn_r_norm")))
    val q = project(CosineSearch.withNormSq(queries, vecCol), vecCol, rDims, seed, dims)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("norm_sq").as("q_norm_sq"), col("rvec").as("q_rvec"),
        sqrt(rDot(col("rvec"), col("rvec"), rDims)).as("q_r_norm"))

    // Reduced-space screen: narrow projections only, query side broadcast
    // (the corpus stays partitioned in place), and a bounded top-candK
    // aggregation instead of a window sort of the fan-out.
    val screened = TopKAggregator.topKPerGroup(
      broadcast(q.select(col("query_id"), col("q_rvec"), col("q_r_norm")))
        .crossJoin(c.select(col("nn_id"), col("nn_rvec"), col("nn_r_norm")))
        .filter(col("query_id") =!= col("nn_id"))
        .withColumn("r_sim",
          rDot(col("q_rvec"), col("nn_rvec"), rDims) /
            (col("q_r_norm") * col("nn_r_norm")))
        .filter(col("r_sim").isNotNull)
        .select(col("query_id"), col("nn_id"), col("r_sim")),
      Seq("query_id"), "nn_id", "r_sim", candK)

    // Exact rescore of the candK survivors; final rank is over candK
    // rows per query — bounded again.
    val rescored = screened.select(col("query_id"), col("nn_id"))
      .join(c.select(col("nn_id"), col("nn_vec"), col("nn_norm_sq")), Seq("nn_id"))
      .join(q.select(col("query_id"), col("q_vec"), col("q_norm_sq")), Seq("query_id"))
      .withColumn("cos_sim",
        CosineSearch.cosine(
          CosineSearch.dotDecimal(col("q_vec"), col("nn_vec")),
          col("q_norm_sq"), col("nn_norm_sq")))
      .select(col("query_id"), col("nn_id"), col("cos_sim"))
    TopKAggregator.topKPerGroup(rescored, Seq("query_id"), "nn_id", "cos_sim", k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cos_sim"))
  }
}
