package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the points not dominated by any other —
  * `a` dominates `b` iff `a.x ≥ b.x ∧ a.y ≥ b.y ∧ (a.x > b.x ∨ a.y > b.y)`
  * (both dimensions maximized; negate a column to minimize it). The
  * curation use: the length/quality (or cost/score) trade-off frontier of
  * a corpus without scoring every pair.
  *
  * For distinct points sorted by (x DESC, y DESC), every dominator of a
  * point sorts strictly before it, and a point survives iff the running
  * max of y over the STRICTLY preceding rows is < its own y — one sort,
  * one window, no O(n²) pair join.
  *
  * A global sort-window would run in a single task, so this is two-phase
  * (the standard distributed-skyline shape): per-bucket frontiers via a
  * hash-partitioned window (parallel, bucket-sized sorts), then the exact
  * rule again over the union of survivors. Phase 2's input is
  * Σ per-bucket frontier sizes — for random data the 2-D frontier is
  * O(log n) points, so the global pass touches a vanishing fraction of
  * the corpus; correctness never depends on that (phase 1 only discards
  * points dominated within their own bucket, which are dominated
  * globally too — the filter is conservative).
  */
object Skyline {

  /** Returns the DISTINCT frontier points (xCol, yCol), both maximized.
    * Join back on (x, y) to recover full rows. */
  def pareto2d(df: DataFrame, xCol: String, yCol: String,
      nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"bad nBuckets=$nBuckets")
    val pts = df.select(col(xCol), col(yCol))
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .distinct()
    val local = keep(pts
        .withColumn("__b", pmod(hash(col(xCol), col(yCol)), lit(nBuckets))),
      xCol, yCol, Seq("__b")).drop("__b")
    keep(local, xCol, yCol, Seq.empty)
  }

  /** Survivors of the running-max-y rule within each partition group. */
  private def keep(pts: DataFrame, xCol: String, yCol: String,
      partCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(xCol).desc, col(yCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("__maxy", max(col(yCol)).over(w))
      .filter(col("__maxy").isNull || col("__maxy") < col(yCol))
      .drop("__maxy")
  }
}
