package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source BFS shortest paths (unweighted hop distance) — the
  * reachability/centrality primitive behind "how far is every entity
  * from this root" questions (account-takeover blast radius, referral
  * depth, supplier-network distance).
  *
  * Frontier iteration, one round per hop: the current frontier joins the
  * edge table, discovered-before nodes are anti-joined away, and the
  * remainder becomes the next frontier. Per round that is ONE edge-keyed
  * shuffle join + one anti join against the (node-sized, not edge-sized)
  * distance table — never a path enumeration, so dense graphs cost
  * O(edges × diameter), not O(paths). Each generation is eagerly
  * localCheckpoint'd and its predecessor released
  * ([[graft.core.Checkpoints]]); the driver's only per-round action is
  * the frontier-empty probe (`isEmpty` on a node-sized frame), the same
  * fixpoint pattern as [[PageRank]] / ConnectedComponents.
  *
  * Distances are exact integers — bit-portable by construction. The
  * DuckDB oracle BFSes the same graph with a recursive UNION CTE (dedup
  * on (node, dist) keeps it polynomial) and min-aggregates — an
  * independent algorithm.
  */
object ShortestPaths {

  /** (node, dist) for every node reachable from `source` within
    * `maxHops` — unreachable nodes are absent, the source itself is
    * dist 0. */
  def fromSource(edges: DataFrame, srcCol: String, dstCol: String,
      source: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"need maxHops >= 0, got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    // materialize the edge projection ONCE: without this, an edge table
    // derived from upstream joins (the common case) re-executes its
    // whole lineage on every frontier round — measured 4x the operator's
    // cost on the bipartite bench graph
    // materialized ONCE: an edge table derived from upstream joins (the
    // common case) would otherwise re-execute its whole lineage on every
    // frontier round. (A src-hash pre-partition was tried and reverted:
    // checkpoint loses the partitioning for join reuse, so it only added
    // a shuffle; per-round the edge side rides AQE like any other join.)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint()
    // one checkpointed frame PER HOP, unioned lazily: the accumulated
    // distance table is never re-materialized each round (that rewrite
    // cost O(rounds × nodes) and dominated the frontier work itself)
    val seed = Seq((source, 0L)).toDF("node", "dist").localCheckpoint()
    var frames = List(seed)
    var frontier = seed
    var hop = 0
    var done = maxHops == 0
    while (!done) {
      val seen = frames.map(_.select("node")).reduce(_ unionByName _)
      val next = frontier.join(e, col("node") === col("__src"))
        .select(col("__dst").as("node"), (col("dist") + 1L).as("dist"))
        .join(seen, Seq("node"), "left_anti")
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint() // eager — each hop's frame materializes once
      hop += 1
      val exhausted = next.isEmpty
      if (!exhausted) { frames = next :: frames; frontier = next }
      done = exhausted || hop >= maxHops
    }
    val out = frames.reduce(_ unionByName _)
    graft.core.Checkpoints.releaseLocal(e)
    out
  }
}
