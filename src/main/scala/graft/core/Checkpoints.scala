package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block release for iterative localCheckpoint chains.
  *
  * Iterative operators (BPE training, k-means, PQ training) truncate
  * lineage each round with `localCheckpoint()`; the checkpointed blocks
  * of generation N are dead the moment generation N+1 is EAGERLY
  * materialized, but Spark never releases them — at tens of rounds
  * that is benign, at tokenizer-training round counts (tens of
  * thousands) it pins every generation in executor storage until
  * eviction pressure. `releaseLocal` drops the cached RDD blocks behind
  * a checkpointed generation.
  *
  * Only call it on a generation whose SUCCESSOR is already eagerly
  * checkpointed (the `localCheckpoint()` default) — a released local
  * checkpoint has no lineage to recompute from. */
object Checkpoints {
  def releaseLocal(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
