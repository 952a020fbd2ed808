package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group embedding centroids as relational aggregation — the building
  * block for IVF (re)training: a k-means iteration is `ivfAssign` (assign
  * to nearest centroid, CosineSearch.scala) + `meanCentroids` (recompute),
  * both plain shuffles that scale out.
  *
  * Two outputs:
  *  - `dimSums`: per-(group, dimension) DECIMAL-exact sums + counts.
  *    Decimal addition is associative, so the result is bit-identical
  *    regardless of partitioning or engine (the DuckDB-oracle path; the
  *    mean is derivable as sum/n downstream).
  *  - `meanCentroids`: per-group mean vector re-packed as ARRAY<FLOAT>
  *    (the production path feeding the next `ivfAssign` round; double
  *    summation — fast, not canonical across engines).
  *
  * Shuffle shape: posexplode fans each vector into `dim` rows, then one
  * hash aggregation on (group, pos) with map-side partial sums — rows in
  * flight scale as |vecs| x dim but the aggregate state is only
  * |groups| x dim. No window, no driver-side collection.
  */
object Centroids {

  /** DECIMAL-exact per-dimension sums: (groupCol, pos, dim_sum, n).
    * Elements pass through double -> DECIMAL(20,12) (Spark's cast =
    * BigDecimal.valueOf rounding, the engine-portable canonicalization
    * proven by the cosine queries), summed into DECIMAL(30,12). */
  def dimSums(vecs: DataFrame, groupCol: String, vecCol: String): DataFrame =
    vecs.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(
        sum(col("x").cast("double").cast("decimal(20,12)"))
          .cast("decimal(30,12)").as("dim_sum"),
        count(lit(1)).as("n"))

  /** Fixed-point per-dimension sums: (groupCol, pos, dim_sum_fp, n) with
    * `dim_sum_fp = sum(round-free x * 2^shift)` as BIGINT. Scaling a
    * float by a power of two only shifts its exponent, so the scaled
    * value is an exact integer for any |x| >= 2^(23-shift) (~3e-8 at the
    * default shift 48) — no decimal rounding anywhere, hence bit-equal
    * on every engine. The true sum is dim_sum_fp / 2^shift, losslessly.
    * Long accumulation holds ~2^63-48 = 32k of mass per group; use
    * `dimSums` (decimal) when group sums can exceed that. */
  def dimSumsFixedPoint(
      vecs: DataFrame, groupCol: String, vecCol: String,
      shift: Int = 48): DataFrame = {
    val scale = math.pow(2.0, shift)
    vecs.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(
        sum((col("x").cast("double") * lit(scale)).cast("long"))
          .as("dim_sum_fp"),
        count(lit(1)).as("n"))
  }

  /** Per-group mean vectors: (groupCol, centroid ARRAY<FLOAT>). */
  def meanCentroids(vecs: DataFrame, groupCol: String, vecCol: String): DataFrame =
    vecs.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy(col(groupCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m").cast("float")).as("centroid"))

  /** One k-means (Lloyd) iteration by cosine assignment: assign every
    * vector to its nearest centroid, then recompute centroid means.
    * Returns (centroidIdCol, centroid) with the same shape as the input
    * centroids, ready for the next iteration or for `ivfTopK`. */
  def kmeansStep(
      vecs: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, centroidIdCol: String): DataFrame = {
    val assigned =
      CosineSearch.ivfAssign(vecs, centroids, idCol, vecCol, centroidIdCol)
    meanCentroids(assigned, "centroid_id", vecCol)
      .withColumnRenamed("centroid_id", centroidIdCol)
      .withColumnRenamed("centroid", vecCol)
  }
}
