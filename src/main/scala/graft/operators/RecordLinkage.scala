package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (1969) — the principled
  * scoring layer over the candidate-pair machinery ([[FuzzyJoin]],
  * blocking, [[GoldenRecord]]): each comparison field contributes
  * ln(m/u) when it agrees and ln((1−m)/(1−u)) when it disagrees, where
  * m = P(agree | match) and u = P(agree | non-match) are COUNTED from
  * a labeled pair set (supervised counting, not EM — the variant whose
  * arithmetic is exactly replayable). Pairs above/below thresholds
  * become links/non-links; the band between is clerical review.
  *
  * Engine-exactness: m and u are add-one-smoothed exact rationals of
  * counts; each field's two weights quantize once via
  * floor(1e6·ln(·)) — ln on a BOUNDED domain (two calls per field) —
  * and every pair's score is then an exact integer sum of micro
  * weights. The weight table is one row (fields are columns), carried
  * to the scorer as a broadcast scalar frame — no collect, no join
  * keyed on pair volume.
  *
  * Scale shape: weight estimation is one labeled-pair scan; scoring is
  * one candidate-pair scan with a one-row broadcast — both linear. */
object RecordLinkage {

  /** One-row weight frame from labeled pairs: for each agreement flag
    * column f (boolean), columns n_match, n_nonmatch, f_m, f_u,
    * f_wa_micro, f_wd_micro. Add-one smoothing keeps every ln finite
    * on degenerate training sets. */
  def fieldWeights(labeled: DataFrame, labelCol: String,
      agreeCols: Seq[String]): DataFrame = {
    require(agreeCols.nonEmpty, "need at least one agreement column")
    val aggs = Seq(
      count_if(col(labelCol)).as("n_match"),
      count_if(!col(labelCol)).as("n_nonmatch")) ++
      agreeCols.flatMap { f =>
        Seq(count_if(col(labelCol) && col(f)).as(s"__am_$f"),
          count_if(!col(labelCol) && col(f)).as(s"__au_$f"))
      }
    val counted = labeled
      .filter(col(labelCol).isNotNull &&
        agreeCols.map(col(_).isNotNull).reduce(_ && _))
      .agg(aggs.head, aggs.tail: _*)
    val nm = col("n_match").cast("double")
    val nu = col("n_nonmatch").cast("double")
    val weightCols = agreeCols.flatMap { f =>
      val m = (col(s"__am_$f").cast("double") + lit(1.0)) /
        (nm + lit(2.0))
      val u = (col(s"__au_$f").cast("double") + lit(1.0)) /
        (nu + lit(2.0))
      Seq(m.as(s"${f}_m"), u.as(s"${f}_u"),
        floor(log(m / u) * lit(1e6)).cast("long").as(s"${f}_wa_micro"),
        floor(log((lit(1.0) - m) / (lit(1.0) - u)) * lit(1e6))
          .cast("long").as(s"${f}_wd_micro"))
    }
    counted.select((Seq(col("n_match"), col("n_nonmatch")) ++
      weightCols): _*)
  }

  /** Score candidate pairs against a [[fieldWeights]] frame: appends
    * score_micro (exact integer) and score (nats). The weight frame
    * rides a broadcast cross join — one row, never a shuffle. */
  def score(pairs: DataFrame, weights: DataFrame,
      agreeCols: Seq[String]): DataFrame = {
    val w = weights.select(agreeCols.flatMap(f =>
      Seq(col(s"${f}_wa_micro"), col(s"${f}_wd_micro"))): _*)
    val total = agreeCols.map(f =>
      when(col(f), col(s"${f}_wa_micro"))
        .otherwise(col(s"${f}_wd_micro")))
      .reduce(_ + _)
    pairs.crossJoin(broadcast(w))
      .withColumn("score_micro", total)
      .drop(agreeCols.flatMap(f =>
        Seq(s"${f}_wa_micro", s"${f}_wd_micro")): _*)
      .withColumn("score",
        col("score_micro").cast("double") / lit(1.0e6))
  }
}
