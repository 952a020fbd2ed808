package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wald's Sequential Probability Ratio Test (SPRT, 1945) over ordered
  * binary outcomes — the "stop the experiment as soon as the data
  * decides" companion to the fixed-horizon tests in [[Stats]]: the
  * cumulative log-likelihood ratio walks between ln(β/(1−α)) and
  * ln((1−β)/α), and the FIRST boundary crossing is the decision. On
  * always-on pipelines this is the natural monitor shape (each batch
  * appends to the walk); here it runs retrospectively over the ordered
  * history, reporting when the decision WOULD have fired.
  *
  * Engine-exactness: the two per-observation increments
  * ln(p1/p0) and ln((1−p1)/(1−p0)) and both thresholds are CONSTANTS —
  * computed once driver-side and floor-quantized to micro-nat integer
  * literals that land identically in the Spark plan and the SQL oracle
  * — so the walk is an exact integer cumulative sum over one ordered
  * window, and the first-crossing argmin is an exact min(struct).
  * `orderCol`s must totally order each key's observations (pass a
  * tiebreaker column).
  *
  * Scale shape: one keyed window pass + one aggregate — no joins, no
  * iteration; the walk never materializes per-step state beyond the
  * running sum. */
object SequentialTest {

  /** Micro-nat constants for an SPRT of p0 vs p1 at error rates
    * (alpha, beta). */
  final case class Design(p0: Double, p1: Double,
      alpha: Double, beta: Double) {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"need distinct interior p0/p1, got $p0/$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"need interior alpha/beta, got $alpha/$beta")
    val winMicro: Long = math.floor(math.log(p1 / p0) * 1e6).toLong
    val loseMicro: Long =
      math.floor(math.log((1 - p1) / (1 - p0)) * 1e6).toLong
    val upperMicro: Long =
      math.floor(math.log((1 - beta) / alpha) * 1e6).toLong
    val lowerMicro: Long =
      math.floor(math.log(beta / (1 - alpha)) * 1e6).toLong
  }

  /** Run the SPRT per key over `outcomeCol` (0/1) ordered by
    * `orderCols`. Output: key, n, llr_final, decision
    * ('h1' | 'h0' | 'continue'), n_decide (1-based observation index
    * of the first crossing, null while 'continue'). */
  def sprt(df: DataFrame, keyCol: String, orderCols: Seq[String],
      outcomeCol: String, design: Design): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val inc = when(col(outcomeCol).cast("long") === 1L,
      lit(design.winMicro)).otherwise(lit(design.loseMicro))
    val walked = df
      .filter(col(outcomeCol).isNotNull)
      .withColumn("__llr", sum(inc).over(w))
      .withColumn("__i", row_number().over(w))
      .withColumn("__cross",
        when(col("__llr") >= design.upperMicro, lit("h1"))
          .when(col("__llr") <= design.lowerMicro, lit("h0")))
    walked.groupBy(col(keyCol)).agg(
        count(lit(1)).as("n"),
        max(struct(col("__i"), col("__llr"))).as("__last"),
        min(when(col("__cross").isNotNull,
          struct(col("__i"), col("__cross")))).as("__first"))
      .select(col(keyCol), col("n"),
        (col("__last.__llr").cast("double") / lit(1.0e6))
          .as("llr_final"),
        coalesce(col("__first.__cross"), lit("continue")).as("decision"),
        col("__first.__i").cast("long").as("n_decide"))
  }
}
