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

  test("maxIter truncation raises instead of returning wrong clusters") {
    // n09-n08-...-n00 as a path with the minimum at one end: the min
    // label travels one hop per round, so 3 rounds cannot finish and the
    // truncated labels would be silently wrong — the loop must raise
    val chain = (0 until 9).map(i => f"n$i%02d" -> f"n${i + 1}%02d")
    val e = intercept[RuntimeException] {
      ConnectedComponents.labels(edges(chain: _*), "doc_a", "doc_b",
        maxIter = 3).count()
    }
    assert(e.getMessage.contains("did not converge"))
    assert(e.getMessage.contains("maxIter"))
    // with enough rounds the same graph converges to the chain head
    val m = ConnectedComponents.labels(edges(chain: _*), "doc_a", "doc_b",
      maxIter = 12).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.values.toSet == Set("n00"))
    assert(m.size == 10)
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
