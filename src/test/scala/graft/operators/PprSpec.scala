package graft.operators

import graft.SparkSpec

class PprSpec extends SparkSpec {
  import spark.implicits._

  // path graph a-b-c-d (undirected)
  private def edges = Seq(("a", "b"), ("b", "a"), ("b", "c"),
    ("c", "b"), ("c", "d"), ("d", "c")).toDF("src", "dst")

  test("restart mass concentrates near the seed") {
    // a path graph is bipartite, so finite iteration counts carry a
    // parity ripple between odd/even distance classes — the robust
    // invariants are the extremes: the seed holds the most mass, the
    // far end the least.
    val r = PageRank.personalized(edges, "src", "dst", Seq("a"),
      iters = 8).as[(String, Double)].collect().toMap
    assert(Seq("b", "c", "d").forall(n => r("a") > r(n)),
      s"seed must dominate: $r")
    assert(Seq("a", "b", "c").forall(n => r(n) > r("d")),
      s"far end must trail: $r")
  }

  test("unreachable nodes keep rank exactly zero") {
    val disconnected = edges.union(
      Seq(("x", "y"), ("y", "x")).toDF("src", "dst"))
    val r = PageRank.personalized(disconnected, "src", "dst",
      Seq("a"), iters = 4).as[(String, Double)].collect().toMap
    assert(r("x") === 0.0 && r("y") === 0.0)
    assert(r("a") > 0.0 && r("d") > 0.0)
  }

  test("uniform seeds over all nodes reproduce classic pagerank") {
    val all = Seq("a", "b", "c", "d")
    val ppr = PageRank.personalized(edges, "src", "dst", all, iters = 5)
      .as[(String, Double)].collect().toMap
    val pr = PageRank.run(edges, "src", "dst", iters = 5)
      .as[(String, Double)].collect().toMap
    all.foreach { n =>
      assert(math.abs(ppr(n) - pr(n)) < 1e-12, s"node $n")
    }
  }
}
