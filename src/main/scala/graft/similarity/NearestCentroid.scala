package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-centroid (Rocchio) classification over an embedding column:
  * each query takes the label whose class SUM-vector it is most
  * cosine-similar to — the O(|labels|) classifier that replaces
  * [[KnnClassify]]'s O(corpus) vote once classes are known. Cosine is
  * scale-invariant, so the UNNORMALIZED sum vector stands in for the
  * mean — no division, no extra rounding surface.
  *
  * Exactness: the [[graft.operators.LinearModel.logisticIrlsGrid]]
  * floor discipline end to end — every per-element term quantizes via
  * floor(x·1e12) (an exact IEEE op on bit-identical doubles; a
  * double→DECIMAL CAST would round Spark's shortest-repr string where
  * DuckDB rounds the binary value), all sums are exact integers whose
  * magnitudes stay below 2^53 (norm terms quantize at 1e6 for exactly
  * this reason — a 1e-12 unit would push Σcv² representations to 1e17,
  * where engines' big-integer→double conversions diverge in the last
  * ulp), and the closing cosine is one fixed-shape double expression.
  *
  * Scale shape: ONE corpus pass builds the (label, idx) centroid table
  * — |labels|·dim rows, broadcast to the query side; scoring is a
  * per-query explode joined to that broadcast — no corpus×corpus
  * pair work anywhere. Contract: class sizes up to ~5e3·dim keep every
  * integer sum under 2^53 (generous for real label sets; beyond it,
  * coarsen the element unit). */
object NearestCentroid {

  def predict(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String): DataFrame = {
    val cent = corpus
      .filter(col(labelCol).isNotNull && col(vecCol).isNotNull)
      .select(col(labelCol).as("__label"),
        posexplode(col(vecCol)).as(Seq("idx", "x")))
      .groupBy(col("__label"), col("idx"))
      .agg(sum(floor(col("x").cast("double") * lit(1.0e12))).as("cvi"))
    val centD = cent.select(col("__label"), col("idx"),
      (col("cvi").cast("double") / lit(1.0e12)).as("cv"))
    val centNorm = centD.groupBy(col("__label"))
      .agg(sum(floor(col("cv") * col("cv") * lit(1.0e6))).as("cni"))
    val q = queries
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"),
        posexplode(col(vecCol)).as(Seq("idx", "qxf")))
      .select(col("query_id"), col("idx"),
        col("qxf").cast("double").as("qx"))
    val qNorm = q.groupBy(col("query_id"))
      .agg(sum(floor(col("qx") * col("qx") * lit(1.0e12))).as("qni"))
    val dots = q.join(broadcast(centD), Seq("idx"))
      .groupBy(col("query_id"), col("__label"))
      .agg(sum(floor(col("qx") * col("cv") * lit(1.0e12))).as("doti"))
    val scored = dots
      .join(broadcast(centNorm), Seq("__label"))
      .join(qNorm, Seq("query_id"))
      .select(col("query_id"), col("__label"),
        ((col("doti").cast("double") / lit(1.0e12)) /
          (sqrt(col("qni").cast("double") / lit(1.0e12)) *
            sqrt(col("cni").cast("double") / lit(1.0e6))))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("__label").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("__label").as("pred_label"),
        col("cos_sim"))
  }
}
