package graft.operators

import graft.SparkSpec

class ClosenessSpec extends SparkSpec {
  import spark.implicits._

  // undirected path a-b-c-d as directed edge pairs
  private def pathEdges() =
    Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("c", "d"), ("d", "c")).toDF("src", "dst")

  test("single-landmark harmonic closeness is exact integral micro") {
    val lm = Seq("a").toDF("s")
    val out = ShortestPaths.harmonicCloseness(
        pathEdges(), "src", "dst", lm, "s", 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("b") === ((1L, 1000000000000L))) // 1/1
    assert(out("c") === ((1L, 500000000000L))) // 1/2
    assert(out("d") === ((1L, 333333333333L))) // floor(1e12/3)
    assert(!out.contains("a")) // self distance 0 excluded
  }

  test("multi-landmark sums reciprocals over reaching seeds") {
    val lm = Seq("a", "d").toDF("s")
    val out = ShortestPaths.harmonicCloseness(
        pathEdges(), "src", "dst", lm, "s", 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // b: 1/1 (from a) + floor(1e12/2) (from d)
    assert(out("b") === 1000000000000L + 500000000000L)
    // a: from d at distance 3 only
    assert(out("a") === 333333333333L)
  }

  test("maxHops truncates reach; unreached nodes are absent") {
    val lm = Seq("a").toDF("s")
    val out = ShortestPaths.harmonicCloseness(
        pathEdges(), "src", "dst", lm, "s", 2)
      .collect().map(_.getString(0)).toSet
    assert(out === Set("b", "c")) // d is 3 hops out
  }

  test("fromSources one loop equals per-seed fromSource runs") {
    val lm = Seq("a", "c").toDF("s")
    val multi = ShortestPaths.fromSources(
        pathEdges(), "src", "dst", lm, "s", 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val single = Seq("a", "c").flatMap { s =>
      ShortestPaths.fromSource(pathEdges(), "src", "dst", s, 10)
        .collect().map(r => (s, r.getString(0), r.getLong(1)))
    }.toSet
    assert(multi === single)
  }
}
