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
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint()
    var frontier = dist
    var hop = 0
    var done = maxHops == 0
    while (!done) {
      val next = frontier.join(e, col("node") === col("__src"))
        .select(col("__dst").as("node"), (col("dist") + 1L).as("dist"))
        .join(dist.select("node"), Seq("node"), "left_anti")
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint() // eager: safe to release the inputs below
      hop += 1
      if (next.isEmpty || hop >= maxHops) done = true
      val grown = dist.unionByName(next).localCheckpoint()
      graft.core.Checkpoints.releaseLocal(dist)
      if (frontier ne dist) graft.core.Checkpoints.releaseLocal(frontier)
      dist = grown
      frontier = next
    }
    dist
  }
}
