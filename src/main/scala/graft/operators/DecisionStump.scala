package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Best single-split finder ("decision stump") for a binary label on a
  * numeric feature: the threshold minimizing weighted Gini impurity —
  * the weak learner behind boosted filters and the quickest "does this
  * feature separate good from bad documents at all" QA probe
  * (one-rule baselines; a curation team's first question about a new
  * quality signal).
  *
  * ENGINE-EXACT BY INTEGERS ONLY: minimizing weighted Gini is
  * maximizing Σ_side (pos² + neg²)/n_side, so each candidate split
  * scores as two micro integral divisions
  * ([[Inference.microDiv]] — DECIMAL(38,0), no BIGINT wrap) summed as
  * integers; the argmax compares exact integers with a deterministic
  * smaller-threshold tie-break. No doubles until the display columns.
  *
  * Work: one corpus groupBy to the per-distinct-value (pos, n) table,
  * one cumulative window over it (value-ordered, distinct-value sized
  * — pre-bin heavy continuous domains upstream, the
  * [[Stats.ksStatistic]] contract), one top-1. Output one row:
  * threshold (split is `x <= threshold`), n, n_left, pos_left,
  * pos_right, gini_weighted. */
object DecisionStump {

  private def d(c: Column) = c.cast("decimal(18,2)")
  private def i38(c: Column) = c.cast("decimal(38,0)")

  def bestSplit(df: DataFrame, featureCol: String, labelCol: String,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    val vm = (d(col(featureCol)) * 100).cast("long")
    val y = col(labelCol).cast("long")
    // retained: the cumulative window AND the totals row both read it
    // — otherwise the corpus is scanned twice
    val perValue = scope.retain(df
      .filter(col(featureCol).isNotNull && col(labelCol).isNotNull)
      .select(vm.as("vm"), y.as("y"))
      .groupBy(col("vm"))
      .agg(sum(col("y")).cast("long").as("pos"),
        count(lit(1)).as("n")))
    val w = Window.orderBy(col("vm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perValue
      .withColumn("posL", sum(col("pos")).over(w))
      .withColumn("nL", sum(col("n")).over(w))
    val totals = perValue.agg(sum(col("pos")).cast("long").as("posT"),
      sum(col("n")).cast("long").as("nT"))
    val scored = cum.crossJoin(broadcast(totals))
      .withColumn("nR", col("nT") - col("nL"))
      .filter(col("nR") > 0) // the split must leave a right side
      .withColumn("negL", col("nL") - col("posL"))
      .withColumn("posR", col("posT") - col("posL"))
      .withColumn("negR", col("nR") - col("posR"))
    val side = (p: Column, g: Column, n: Column) =>
      Inference.microDiv(lit(1000000000000L).cast("decimal(38,0)") *
        (i38(p) * p + i38(g) * g), n)
    val withScore = scored.withColumn("score",
      side(col("posL"), col("negL"), col("nL")) +
        side(col("posR"), col("negR"), col("nR")))
    val top = Window.orderBy(col("score").desc, col("vm").asc)
    withScore.withColumn("__rn", row_number().over(top))
      .filter(col("__rn") === 1)
      .select(
        (col("vm").cast("double") / lit(100.0)).as("threshold"),
        col("nT").as("n"), col("nL").as("n_left"),
        col("posL").as("pos_left"), col("posR").as("pos_right"),
        // the winning score exceeds 2^53 — convert through the
        // engine-neutral hi/lo split (argmax itself compared integers)
        (lit(1.0) - LinearModel.intMomentToDouble(col("score"), 1.0e12) /
          col("nT").cast("double")).as("gini_weighted"))
  }
}
