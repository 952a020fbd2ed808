package graft.dedup

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def edges(pairs: (String, String)*) = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  private def labelMap(pairs: (String, String)*): Map[String, String] =
    ConnectedComponents.labels(edges(pairs: _*), "doc_a", "doc_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("two disjoint components get their minimum ids") {
    val m = labelMap("b" -> "c", "a" -> "b", "x" -> "y")
    assert(m == Map(
      "a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("a chain longer than one hop converges to the global minimum") {
    // a-b-c-d-e as a path: min label must travel the whole diameter
    val m = labelMap("d" -> "e", "c" -> "d", "b" -> "c", "a" -> "b")
    assert(m.values.toSet == Set("a"))
    assert(m.keySet == Set("a", "b", "c", "d", "e"))
  }

  test("cycles terminate and label correctly") {
    val m = labelMap("a" -> "b", "b" -> "c", "c" -> "a")
    assert(m == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("edge direction is irrelevant (symmetrized)") {
    assert(labelMap("z" -> "a") == Map("a" -> "a", "z" -> "a"))
  }

  test("clusters summarizes representative and size") {
    val l = ConnectedComponents.labels(
      edges("a" -> "b", "b" -> "c", "x" -> "y"), "doc_a", "doc_b")
    val sizes = ConnectedComponents.clusters(l)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("a" -> 3L, "x" -> 2L))
  }

  test("the iteration loop leaves nothing in the SQL cache") {
    // generations live as localCheckpoint block RDDs (freed by the
    // ContextCleaner when unreferenced), not CacheManager entries — a
    // long session accumulates no catalog-visible cache state
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    ConnectedComponents.labels(
      edges("a" -> "b", "b" -> "c"), "doc_a", "doc_b").count()
    assert(cm.isEmpty)
  }
}
