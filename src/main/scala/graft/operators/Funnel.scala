package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** Ordered-step funnel analysis — for each entity, the earliest moment
  * it completed step 1, then step 2 STRICTLY AFTER step 1, and so on
  * (the product-analytics staple: view -> click -> purchase with each
  * conversion forced into causal order; an entity that clicked before
  * ever viewing has not "converted" at the click step).
  *
  * Shape at scale: the event log is filtered to the funnel's event
  * types in the scan stage, then each step is one entity-keyed left
  * join + aggregation over the (already entity-partitioned) previous
  * frontier — k-1 joins for a k-step funnel, each reusing the entity
  * hash partitioning, never a window over the raw log. The frontier
  * table is |entities|-sized, the per-step event tables are
  * |matching events|-sized; nothing is broadcast (both sides are
  * unbounded at 100 TB).
  */
object Funnel {

  /** One row per entity that completed step 1: the step-completion
    * timestamps `t1..tk` (NULL from the first uncompleted step on) and
    * `steps_completed`. Timestamps compare strictly (`>`), so a step
    * landing on the exact same timestamp as its predecessor does not
    * count as progress — the deterministic reading of "after". */
  def earliest(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    // retained: consumed k times (frontier init + k-1 step joins) —
    // without it each step re-scans the raw event log
    val relevant = scope.retain(events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(entityCol).as("__e"), col(typeCol).as("__t"),
        col(tsCol).as("__ts")))
    var frontier = relevant.filter(col("__t") === steps.head)
      .groupBy(col("__e")).agg(min(col("__ts")).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = s"t$i"
      val carried = col("__e") +: (1 to i).map(j => col(s"t$j"))
      frontier = frontier
        .join(relevant.filter(col("__t") === step), Seq("__e"), "left")
        .groupBy(carried: _*)
        .agg(min(when(col("__ts") > col(prev), col("__ts")))
          .as(s"t${i + 1}"))
    }
    // deepest step's test must be OUTERMOST (t3 set implies t2 set)
    val completed = steps.indices.drop(1)
      .foldLeft(lit(1L)) { case (acc, i) =>
        when(col(s"t${i + 1}").isNotNull, lit((i + 1).toLong)).otherwise(acc)
      }
    frontier
      .withColumn("steps_completed", completed)
      .withColumnRenamed("__e", entityCol)
  }
}
