package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction (Seidman 1983): the maximal subgraph in which
  * every node keeps degree >= k — the standard "dense nucleus" filter
  * graph pipelines run before expensive per-node work (community
  * detection, embedding training, fraud-ring triage), and the degree
  * floor that bounds [[Triangles]]-style wedge fan-out when applied
  * first.
  *
  * Simultaneous peeling, one round per generation: compute degrees,
  * drop every node under the floor, repeat until no node falls. Per
  * round that is ONE degree aggregation (map-side partial) + two
  * anti-joins of the edge table against the (node-sized, not
  * edge-sized) removal set — never an explicit subgraph enumeration.
  * The edge frame shrinks monotonically and each generation is eagerly
  * localCheckpoint'd with its predecessor released
  * ([[graft.core.Checkpoints]]), the same fixpoint pattern as
  * [[ShortestPaths]] / ConnectedComponents. Round count is bounded by
  * the peeling depth (5 on the sf0.01 co-order graph at k=80; O(n)
  * pathological chains are cut by `maxIter`).
  *
  * Outputs are exact integers — bit-portable by construction. The
  * q_kcore oracle replays the identical simultaneous-peel rounds as an
  * unrolled CTE chain in DuckDB; KCoreSpec pins the fixpoint against a
  * brute-force reference peeler on adversarial shapes (chains that peel
  * one layer per round, cliques that never peel).
  */
object KCore {

  /** Nodes of the k-core with their in-core degrees: (node, degree),
    * degree counted over the surviving subgraph. `edges` is an
    * undirected edge list, each pair in either orientation; self-loops
    * and duplicate pairs are dropped before peeling so they can't
    * inflate a degree past the floor. */
  /** Under-floor nodes of a CANONICAL (u < v, one row per edge) frame:
    * both endpoints explode into one map-side-combined degree
    * aggregate, output node-sized. Half the scan of the former
    * both-orientations frame for the same partial-agg shuffle. */
  private[operators] def badNodes(cur: DataFrame, k: Int): DataFrame =
    cur.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .filter(col("d") < k).select(col("n").as("u"))

  /** One simultaneous-peel round: drop every edge touching a removed
    * node — two anti-joins of the canonical edge frame against the
    * node-sized removal set (equi-keyed; KCoreSpec pins that neither
    * degenerates to a loop join). */
  private[operators] def removeNodes(cur: DataFrame, bad: DataFrame): DataFrame =
    cur
      .join(bad, Seq("u"), "left_anti")
      .join(bad.select(col("u").as("v")), Seq("v"), "left_anti")
      .select(col("u"), col("v"))

  def extract(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 100): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    // CANONICAL edge frame (u < v), one row per edge: the peel loop
    // scans and re-checkpoints this frame every round, so carrying both
    // orientations (the previous design, solely to make the degree agg
    // a single-column groupBy) paid 2x scan + 2x checkpoint bytes per
    // round; the explode inside badNodes feeds the same map-side
    // partial aggregation from half the input (measured at the 100x
    // sweep — kcore was the round's bending row).
    var cur = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // pin the node-sized removal set: lazily, the SAME degree
      // aggregate runs twice per round — once for the isEmpty probe and
      // again inside removeNodes' anti-join subtree when the next
      // generation materializes (~3 edge scans/round, measured). The
      // eager checkpoint makes it one agg + one removal scan per round
      // (the HITS half-generation precedent; bad is node-sized, cheap
      // to hold and released as soon as the next generation is pinned).
      val bad = badNodes(cur, k).localCheckpoint()
      if (bad.isEmpty) {
        graft.core.Checkpoints.releaseLocal(bad)
        done = true
      } else {
        val next = removeNodes(cur, bad).localCheckpoint()
        graft.core.Checkpoints.releaseLocal(bad)
        graft.core.Checkpoints.releaseLocal(cur)
        cur = next
        iter += 1
      }
    }
    cur.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /** Coreness (degeneracy ordering value) per node: the largest k for
    * which the node survives the k-core, for k in 1..maxK. Peels
    * incrementally — each k starts from the previous core's already-
    * shrunk edge set, so total work is the k-core chain, not maxK
    * independent extractions. Nodes absent from the edge list have
    * coreness 0 and are not returned. */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
      maxK: Int, maxIter: Int = 100): DataFrame = {
    require(maxK >= 1, s"need maxK >= 1, got $maxK")
    var cur = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    def nodesOf(e: DataFrame): DataFrame =
      e.select(explode(array(col("u"), col("v"))).as("u")).distinct()
    // coreness(v) = max k whose core still contains v: at each k the
    // nodes peeled AWAY get coreness k-1; survivors of the final core
    // get maxK. One node-sized frame per k, unioned lazily at the end.
    var layers = List.empty[DataFrame]
    var k = 1
    while (k <= maxK && !cur.isEmpty) {
      // eager: `before` must survive the peel rounds releasing `cur`
      val before = nodesOf(cur).localCheckpoint()
      // peel to the k-core
      var iter = 0
      var done = false
      while (!done && iter < maxIter) {
        val bad = badNodes(cur, k).localCheckpoint()
        if (bad.isEmpty) {
          graft.core.Checkpoints.releaseLocal(bad)
          done = true
        } else {
          val next = removeNodes(cur, bad).localCheckpoint()
          graft.core.Checkpoints.releaseLocal(bad)
          graft.core.Checkpoints.releaseLocal(cur)
          cur = next
          iter += 1
        }
      }
      val peeled = before.join(nodesOf(cur), Seq("u"), "left_anti")
        .select(col("u").as("node"), lit((k - 1).toLong).as("coreness"))
        .localCheckpoint()
      graft.core.Checkpoints.releaseLocal(before)
      layers = peeled :: layers
      k += 1
    }
    val finalCore = nodesOf(cur)
      .select(col("u").as("node"), lit(maxK.toLong).as("coreness"))
    (finalCore :: layers).reduce(_ unionByName _)
      .filter(col("coreness") > 0L)
  }
}
