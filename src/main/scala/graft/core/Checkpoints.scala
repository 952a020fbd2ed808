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

  /** Row ceiling for [[pinSmall]] (and for call sites choosing between
    * a pin and the bounded-partition `coalesce` fallback): ~4M rows of
    * a narrow loop frame is low hundreds of MB — above it AQE's
    * byte-based sizing already produces ample partitions and an extra
    * exchange would be a real cost at scale. */
  val PinMaxRows: Long = 4000000L

  /** Pin a loop frame's partition count before it is checkpointed,
    * WHEN it is known to be small (row count from the previous
    * generation — fixpoint loops already track it for their
    * convergence probes).
    *
    * Why: AQE sizes post-shuffle partitions by map-output BYTES
    * (advisory/minPartitionSize), but the loop frames of the fixpoint
    * operators are byte-tiny and FAN OUT on the next round's join
    * (frontier ⋈ high-degree adjacency, star contraction, dependency
    * back-propagation) — a few MB of frame can carry seconds of probe
    * work per row group. A localCheckpoint then BAKES the coalesced
    * 1–2 partition layout into the RDD, and the next round's
    * broadcast-join probe runs on one core (measured: 5.7 s + 4.8 s +
    * 3.0 s single-task stages inside one q_betweenness run,
    * OPTIMIZATION_r14.md). Re-spreading rows by the frame's own keys
    * restores probe parallelism for one extra exchange whose payload
    * is, by the branch condition, at most `maxRows` small rows.
    *
    * Scale-adaptive by construction: above `maxRows` (default 4M —
    * hundreds of MB at typical loop-frame widths, where AQE's
    * byte-based sizing already yields ample partitions) the frame is
    * returned untouched, so a 100 TB run never pays an extra shuffle
    * for this. `prevRows < 0` (unknown) also skips the pin.
    *
    * Sizing caveat (ADVICE r14): `prevRows` is the PREVIOUS
    * generation's count, so one high-fan-out round can briefly pin a
    * frame that grew past `maxRows`, and a shrink round below the
    * ceiling skips one useful pin. Loop frames of the current call
    * sites (frontier/delta/seen tables) change size gradually per hop,
    * so the one-generation lag is at most one mis-sized round; call
    * sites that fan out by orders of magnitude per round should count
    * first and pin retroactively instead. */
  def pinSmall(df: DataFrame, prevRows: Long, keys: Seq[String],
      maxRows: Long = PinMaxRows): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (prevRows >= 0 && prevRows <= maxRows)
      // numPartitions given explicitly => REPARTITION_BY_NUM origin,
      // which AQE never re-coalesces; the checkpoint then preserves
      // HashPartitioning(keys, n) for downstream equi-joins
      df.repartition(n, keys.map(org.apache.spark.sql.functions.col): _*)
    else df
  }

  /** Broadcast-on-small, the join-side companion to [[pinSmall]]: mark
    * `df` for broadcast when a MEASURED row count proves it small.
    *
    * Why: the iterative operators join their (node/item-sized) state
    * frames against a much larger edge/pair frame every round, but a
    * localCheckpoint'd generation is a LogicalRDD with no catalyst
    * stats, so the planner falls back to a sort-merge join that
    * re-shuffles the BIG side each round (measured on q_hits: the edge
    * table's 7.6 MB shuffle written and read once per half-step,
    * StageProfile r15). The loops already track exact row counts for
    * their convergence probes; a count at or under `maxRows` (node-sized
    * rows — tens of MB hashed at the 4M default) makes the broadcast
    * provably safe, and the big side is then never exchanged at all
    * (guide §3.1). Above the ceiling, or with an unknown count (< 0),
    * the frame is returned untouched and the shuffle plan stands. */
  def broadcastSmall(df: DataFrame, rows: Long,
      maxRows: Long = PinMaxRows): DataFrame =
    if (rows >= 0 && rows <= maxRows)
      org.apache.spark.sql.functions.broadcast(df)
    else df
}
