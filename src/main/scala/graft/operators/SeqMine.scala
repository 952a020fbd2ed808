package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern mining over ordered event streams: which length-L
  * event-type sequences (contiguous, per user, in timestamp order)
  * recur, and across how many distinct users? The order-aware sibling
  * of the [[AssocRules]] basket miner (`q_fim` counts co-occurrence;
  * this counts ORDER) and the length-L generalization of
  * [[Transitions]]' first-order matrix. Reference analogue: fastETL's
  * event-table syncs feed exactly this kind of funnel question
  * downstream; here it is one operator.
  *
  * Semantics: a pattern is a CONTIGUOUS run of L event types for one
  * user ordered by (tsCol, tieCol) — the PrefixSpan-style gapped
  * variant explodes candidate space quadratically and is deliberately
  * out of scope (compose with [[Sessionize]] upstream to bound gaps
  * instead). Occurrences overlap (a user with types a,b,a,b yields
  * a→b, b→a, a→b for L=2).
  *
  * Scale shape: ONE keyed window exchange (per-user lead chain — no
  * self-join, no explode), then a groupBy on the pattern columns whose
  * cardinality is |types|^L, with a map-side partial for occurrences.
  * `support_users` is an exact count-distinct (one extra exchange on
  * the pattern+user pre-distinct); at corpus scale swap in
  * approx_count_distinct upstream if exactness is not needed. */
object SeqMine {

  def topSequences(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, len: Int = 3,
      minUsers: Long = 1L): DataFrame = {
    require(len >= 2 && len <= 6, "sequence length must be in [2, 6]")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val stepCols: Seq[Column] = (0 until len).map { i =>
      (if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
        .as(s"s${i + 1}")
    }
    val steps = df.select(col(userCol) +: stepCols: _*)
      .filter((1 until len).map(i => col(s"s${i + 1}").isNotNull)
        .reduce(_ && _))
    val patCols = (1 to len).map(i => col(s"s$i"))
    steps.groupBy(patCols: _*)
      .agg(count(lit(1)).as("occurrences"),
        count_distinct(col(userCol)).as("support_users"))
      .filter(col("support_users") >= minUsers)
  }
}
