package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** First-order Markov transition matrix over event sequences — for
  * every ordered pair of event types, how often one immediately follows
  * the other within an entity's timeline, and the conditional
  * probability p(to | from) — the "what do users do next" matrix behind
  * next-action prediction and anomaly screens, completing the event
  * analytics family ([[Funnel]], [[Retention]]).
  *
  * Ordering is (timestamp, tiebreak column) inside each entity — the
  * tiebreak makes the successor deterministic when two events share a
  * timestamp, so the matrix is reproducible run to run.
  *
  * Shape at scale: one entity-partitioned window computes each event's
  * successor (entity-keyed shuffle, the same partitioning sessionize
  * uses), then the stream collapses to a |types|^2-bounded count table;
  * row totals derive from that table (never a second corpus pass) and
  * join back as a broadcast. p is a single long/long double division —
  * bit-identical on any IEEE engine.
  */
object Transitions {

  /** (from_type, to_type, n, p): transition counts and conditional
    * probabilities. Entities' final events have no successor and
    * contribute nothing; an entity with one event contributes nothing. */
  def matrix(events: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, typeCol: String,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__e"))
      .orderBy(col("__ts"), col("__tie"))
    val steps = events
      .select(col(entityCol).as("__e"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    // counts feed the output rows AND the row totals — retained so the
    // window+shuffle lineage runs once
    val counts = scope.retain(
      steps.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n")))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("__tot").cast("double")).as("p"))
  }
}
