package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Composition test for the graph family: community DETECTION
  * (LabelProp) feeds community SCORING (GraphMetrics.modularity), link
  * PREDICTION proposes the missing edges, and re-scoring the completed
  * graph confirms the proposals tightened the communities — the full
  * detect → score → predict → re-score loop a curation pipeline runs
  * over co-occurrence graphs.
  *
  * Fixture: two K5-minus-one-edge near-cliques {1..5} (missing (1,2))
  * and {6..10} (missing (6,7)) joined by the bridge (5,6) — 19 edges,
  * known modularity, and exactly two structurally-missing links.
  */
class GraphPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def clique(nodes: Range, skip: (Long, Long)) =
    for {
      a <- nodes; b <- nodes if a < b
      if (a.toLong, b.toLong) != skip
    } yield (a.toLong, b.toLong)

  private val und: Seq[(Long, Long)] =
    clique(1 to 5, (1L, 2L)) ++ clique(6 to 10, (6L, 7L)) :+ ((5L, 6L))

  private def undDF: DataFrame = und.toDF("src", "dst")

  // LabelProp reads directed in-edges: feed both orientations.
  private def bidir: DataFrame =
    (und ++ und.map(_.swap)).toDF("src", "dst")

  private val truePartition: Map[Long, String] =
    ((1L to 5L).map(_ -> "x") ++ (6L to 10L).map(_ -> "y")).toMap

  test("label propagation recovers the two near-cliques") {
    val labels = LabelProp.run(bidir, "src", "dst", 5)
      .as[(Long, Long)].collect().toMap
    val sideA = (1L to 5L).map(labels)
    val sideB = (6L to 10L).map(labels)
    assert(sideA.distinct.size == 1, s"side A split: $labels")
    assert(sideB.distinct.size == 1, s"side B split: $labels")
    assert(sideA.head != sideB.head, s"sides merged: $labels")
  }

  test("modularity of the true partition matches the hand computation") {
    // m=19; per side e_c=9, d_c=19 (three degree-3, one degree-4 — no:
    // 3+3+4+4+5) => contrib = 4*19*9 - 361 = 323; Q = 646/1444.
    val out = GraphMetrics.modularity(undDF, "src", "dst",
        truePartition.toSeq.toDF("node", "comm"), "node", "comm")
      .select("comm", "intra_edges", "degree_sum", "contrib_x4m2", "m",
        "modularity")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r == ((r._1, 9L, 19L, 323L, 19L, 646.0 / 1444.0)))
    }
  }

  test("the detected partition scores exactly like the true one") {
    val labels = LabelProp.run(bidir, "src", "dst", 5)
      .select(col("node"), col("label").cast("string").as("comm"))
    val q = GraphMetrics.modularity(undDF, "src", "dst", labels,
        "node", "comm")
      .select("modularity").as[Double].collect().head
    assert(q == 646.0 / 1444.0)
  }

  test("link prediction ranks exactly the two missing clique edges first") {
    val top = GraphMetrics.linkPredictTopK(undDF, "src", "dst", 2)
      .select("u", "v", "cn", "jacc_ppm", "ra_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // (1,2): cn=3 via {3,4,5}; deg(1)=deg(2)=3 -> union 3, full
    // Jaccard; RA = 2*(1e12 div 4) + (1e12 div 5) = 7e11 (node 5
    // carries the bridge). (6,7): node 6 ALSO carries the bridge, so
    // deg(6)=4 -> union 4, jacc 750000; shared {8,9,10} all degree 4
    // -> RA = 3*(1e12 div 4) = 7.5e11.
    assert(top == Set(
      (1L, 2L, 3L, 1000000L, 700000000000L),
      (6L, 7L, 3L, 750000L, 750000000000L)))
  }

  test("completing the predicted edges raises modularity: the loop closes") {
    val completed = (und ++ Seq((1L, 2L), (6L, 7L))).toDF("src", "dst")
    val q = (g: DataFrame) => GraphMetrics.modularity(g, "src", "dst",
        truePartition.toSeq.toDF("node", "comm"), "node", "comm")
      .select("modularity").as[Double].collect().head
    val before = q(undDF)
    val after = q(completed)
    // hand values: 646/1444 -> 798/1764
    assert(before == 646.0 / 1444.0 && after == 798.0 / 1764.0)
    assert(after > before)
  }
}
