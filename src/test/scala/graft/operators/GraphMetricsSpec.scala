package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def mod(edges: Seq[(Long, Long)], labels: Seq[(Long, String)]) =
    GraphMetrics.modularity(
      edges.toDF("src", "dst"), "src", "dst",
      labels.toDF("node", "comm"), "node", "comm")
      .select("comm", "n_nodes", "intra_edges", "degree_sum",
        "contrib_x4m2", "m", "modularity")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("two triangles with a bridge, perfect split: Q = 70/196") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val labels = Seq(1L -> "a", 2L -> "a", 3L -> "a",
      4L -> "b", 5L -> "b", 6L -> "b")
    val out = mod(edges, labels)
    // m = 7; each side: e_c = 3, d_c = 2+2+3 = 7, contrib = 84-49 = 35.
    assert(out("a") == (("a", 3L, 3L, 7L, 35L, 7L, 70.0 / 196.0)))
    assert(out("b") == (("b", 3L, 3L, 7L, 35L, 7L, 70.0 / 196.0)))
  }

  test("single community scores exactly zero") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val out = mod(edges, Seq(1L -> "x", 2L -> "x", 3L -> "x"))
    // e = m, d = 2m: Q = 1 - 1 = 0; contrib = 4m*m - (2m)^2 = 0.
    assert(out("x") == (("x", 3L, 3L, 6L, 0L, 3L, 0.0)))
  }

  test("unlabelled endpoints drop; isolated labelled community scores 0") {
    // Two triangles + bridge as above, plus unlabelled 7 on node 1 and
    // an isolated labelled node 8 in its own community.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L), (1L, 7L))
    val labels = Seq(1L -> "a", 2L -> "a", 3L -> "a",
      4L -> "b", 5L -> "b", 6L -> "b", 8L -> "c")
    val out = mod(edges, labels)
    // m = 8. a: e=3, d=3+2+3=8, contrib=96-64=32. b: e=3, d=7,
    // contrib=96-49=47. c: all zero. Q = 79/256.
    val q = 79.0 / 256.0
    assert(out("a") == (("a", 3L, 3L, 8L, 32L, 8L, q)))
    assert(out("b") == (("b", 3L, 3L, 7L, 47L, 8L, q)))
    assert(out("c") == (("c", 1L, 0L, 0L, 0L, 8L, q)))
  }

  test("duplicate / reversed / self-loop edges canonicalize before scoring") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L))
    val out = mod(edges, Seq(1L -> "x", 2L -> "x", 3L -> "y"))
    assert(out("x")._6 == 2L) // m: only {1-2, 2-3} survive
    assert(out("x")._3 == 1L) // intra: 1-2
    assert(out("y")._3 == 0L)
  }

  private def lp(edges: Seq[(Long, Long)], k: Int,
      cap: Int = Int.MaxValue) =
    GraphMetrics.linkPredictTopK(edges.toDF("src", "dst"), "src", "dst",
      k, cap)
      .select("u", "v", "cn", "jacc_ppm", "ra_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("path 1-2-3 predicts (1,3) with full Jaccard") {
    val out = lp(Seq((1L, 2L), (2L, 3L)), 10)
    // cn=1 via w=2 (deg 2); union = 1+1-1 = 1 -> jacc 1e6;
    // ra = 1e12/2.
    assert(out == Seq((1L, 3L, 1L, 1000000L, 500000000000L)))
  }

  test("square predicts both diagonals, existing edges excluded") {
    val out = lp(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)), 10)
    // (1,3) via {2,4}, (2,4) via {1,3}: cn=2, union=2+2-2=2 -> 1e6,
    // ra = 2 * (1e12/2... deg of each center is 2) = 2 * 5e11.
    assert(out.toSet == Set(
      (1L, 3L, 2L, 1000000L, 1000000000000L),
      (2L, 4L, 2L, 1000000L, 1000000000000L)))
    // Deterministic rank: k=1 keeps the (u,v)-smaller diagonal.
    assert(lp(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)), 1) ==
      Seq((1L, 3L, 2L, 1000000L, 1000000000000L)))
  }

  test("triangle yields nothing: every wedge pair is already an edge") {
    assert(lp(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 10).isEmpty)
  }

  test("jaccard denominator uses true degrees, not just shared part") {
    // 1-2-3 path plus pendant 3-5: pair (1,3) has deg(1)=1, deg(3)=2.
    val out = lp(Seq((1L, 2L), (2L, 3L), (3L, 5L)), 10)
    val p13 = out.find(r => r._1 == 1L && r._2 == 3L).get
    // cn=1, union = 1+2-1 = 2 -> 500000 ppm.
    assert(p13 == ((1L, 3L, 1L, 500000L, 500000000000L)))
  }

  test("maxWedgeDegree drops celebrity-centered wedges") {
    val star = (1L to 5L).map(i => (0L, i))
    // Hub degree 5: uncapped, every rim pair is a candidate…
    assert(lp(star, 100).size == 10)
    // …capped below 5, the hub can't be a wedge center.
    assert(lp(star, 100, cap = 4).isEmpty)
  }
}
