package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the standard memory/IO lever
  * for billion-vector similarity search (4x smaller vectors, SIMD-friendly
  * integer dot products; the scheme every public ANN library documents):
  * each vector is scaled by its own max-abs so components land in
  * [-127, 127], stored alongside the scale for dequantization.
  *
  * Rounding is written as `sign(x) * floor(|x| * 127 / amax + 0.5)` —
  * explicit round-half-away-from-zero composed from floor, because bare
  * `round()` semantics differ across engines (half-even vs half-away)
  * and the quantized values must be bit-identical wherever they are
  * computed (Spark executors, a DuckDB sidecar, a feature store).
  *
  * Everything is per-row array arithmetic inside the projection — no
  * shuffle, no UDF; quantization cost is one map pass over the corpus.
  */
object Quantize {

  /** `sign(x) * floor(|x| * 127 / amax + 0.5)` as an element expression
    * over double `x` and double `amax` (0 when amax = 0). */
  private def qExpr(x: String, amax: String): String =
    s"""CASE WHEN $amax = 0.0 THEN 0L ELSE
       |  CAST(CASE WHEN CAST($x AS DOUBLE) < 0.0 THEN -1L ELSE 1L END *
       |    floor(abs(CAST($x AS DOUBLE)) * 127.0 / $amax + 0.5) AS BIGINT)
       |END""".stripMargin

  /** Max-abs of a float-array column, in double. */
  def maxAbs(vecCol: Column): Column =
    array_max(transform(vecCol, x => abs(x.cast("double"))))

  /** (…, amax, quant) — the quantized vector (array<int>) plus its
    * scale. Dequantized value = quant_i * amax / 127. */
  def int8(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs
      .withColumn("amax", maxAbs(col(vecCol)))
      .withColumn("quant", expr(
        s"transform($vecCol, x -> CAST(${qExpr("x", "amax")} AS INT))"))

  /** Oracle-friendly digest of the quantization: per-vector scale plus
    * exact integer sums of the quantized components (any rounding
    * divergence anywhere in the vector shifts them). */
  def int8Digest(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs
      .withColumn("amax", maxAbs(col(vecCol)))
      .select(
        col(idCol),
        col("amax"),
        expr(s"aggregate($vecCol, 0L, (acc, x) -> acc + ${qExpr("x", "amax")})")
          .as("q_sum"),
        expr(s"aggregate($vecCol, 0L, (acc, x) -> acc + abs(${qExpr("x", "amax")}))")
          .as("q_l1"))

  /** Integer dot product of two quantized vectors, rescaled to the
    * original space: `amaxA * amaxB / (127 * 127) * sum(qa_i * qb_i)`.
    * The integer sum is exact (codegen'd native loop — see
    * [[graft.functions.IntDotExpr]]); only the final rescale is
    * floating. */
  def dequantizedDot(quantA: Column, quantB: Column, amaxA: Column,
      amaxB: Column): Column =
    amaxA * amaxB / lit(127.0 * 127.0) *
      graft.functions.IntDotExpr.int_dot(quantA, quantB).cast("double")
}
