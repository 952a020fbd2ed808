package graft.operators

import graft.SparkSpec

class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], src: String, hops: Int) =
    ShortestPaths.fromSource(edges.toDF("src", "dst"), "src", "dst",
      src, hops).as[(String, Long)].collect().toMap

  test("diamond graph takes the shorter arm; unreachable nodes absent") {
    // a->b->d, a->c->e->d (d reachable in 2 and 3 -> 2); x isolated
    val edges = Seq("a" -> "b", "b" -> "d", "a" -> "c", "c" -> "e",
      "e" -> "d", "x" -> "y")
    val d = run(edges, "a", 10)
    assert(d == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 2L))
  }

  test("maxHops truncates the frontier, not the found distances") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    assert(run(chain, "a", 2) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    assert(run(chain, "a", 0) == Map("a" -> 0L))
  }

  test("cycles terminate: distances are first-visit, one per node") {
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    assert(run(cyc, "a", 50) == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("results survive repartitioned edge input") {
    val edges = (0 until 60).map(i => (s"n${i % 12}", s"n${(i * 7) % 12}"))
    val a = run(edges, "n0", 6)
    val b = ShortestPaths.fromSource(
      edges.toDF("src", "dst").repartition(7), "src", "dst", "n0", 6)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }
}
