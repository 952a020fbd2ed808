package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]) =
    Triangles.perNode(edges.toDF("src", "dst"), "src", "dst")
      .select("node", "degree", "n_tri", "clustering")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("triangle plus pendant edge") {
    // 1-2-3 triangle, 4 hangs off 1.
    val out = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)))
    assert(out(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((2L, 1L, 1.0)))
    assert(out(4L) == ((1L, 0L, 0.0)))
  }

  test("K4 has C(3,2)=3 triangles per node, clustering 1") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val out = run(edges)
    nodes.foreach { n => assert(out(n) == ((3L, 3L, 1.0))) }
  }

  test("duplicate, reversed, and self-loop edges canonicalize away") {
    val out = run(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L)))
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((2L, 1L, 1.0)))
  }

  test("square (4-cycle) has no triangles") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    Seq(1L, 2L, 3L, 4L).foreach { n => assert(out(n) == ((2L, 0L, 0.0))) }
  }

  test("star around a hub: degree orientation keeps wedges off the hub") {
    // Hub 0 connected to 1..6 plus one rim edge (1,2): exactly one
    // triangle. Also pins the oriented plan does not explode: the hub
    // (degree 7) must be the wedge *target*, never a wedge source.
    val out = run((1L to 6L).map(i => (0L, i)) :+ (1L, 2L))
    assert(out(0L)._2 == 1L)
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("no cartesian product in the plan") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val plan = Triangles.perNode(edges, "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
