package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: simultaneous peel over an in-memory
    * adjacency map, independent of the DataFrame implementation. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var adj = edges
      .filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var changed = true
    while (changed) {
      val bad = adj.collect { case (n, nbrs) if nbrs.size < k => n }.toSet
      changed = bad.nonEmpty
      if (changed)
        adj = adj.collect {
          case (n, nbrs) if !bad(n) => n -> (nbrs -- bad)
        }
    }
    adj.map { case (n, nbrs) => n -> nbrs.size }
  }

  private def refCoreness(edges: Seq[(Long, Long)], maxK: Int): Map[Long, Int] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map { n =>
      n -> (1 to maxK).filter(k => refKCore(edges, k).contains(n))
        .lastOption.getOrElse(0)
    }.filter(_._2 > 0).toMap
  }

  private def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    KCore.extract(edges.toDF("s", "d"), "s", "d", k)
      .as[(Long, Long)].collect().toMap

  test("a chain peels one layer per round down to nothing at k=2") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    assert(run(chain, 2) === Map.empty)
    // k=1 keeps everything with its chain degrees
    assert(run(chain, 1) === refKCore(chain, 1).map { case (n, d) => n -> d.toLong })
  }

  test("a clique never peels; extract returns in-core degrees") {
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assert(run(k5, 4) === (1L to 5L).map(_ -> 4L).toMap)
    assert(run(k5, 5) === Map.empty)
  }

  test("clique with pendant tail: the tail peels, the clique survives") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val tail = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val g = k4 ++ tail
    val got = run(g, 3)
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got === refKCore(g, 3).map { case (n, d) => n -> d.toLong })
  }

  test("cascade: removing one node drags neighbors below the floor") {
    // two triangles sharing a bridge node whose removal at k=3 unravels
    // everything except none (no 3-core at all here)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 4L))
    assert(run(g, 3) === refKCore(g, 3).map { case (n, d) => n -> d.toLong })
    assert(run(g, 2).keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("self-loops and duplicate/bidirectional pairs cannot inflate a degree") {
    val g = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
    // true simple graph is the triangle 1-2-3
    assert(run(g, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(run(g, 3) === Map.empty)
  }

  test("coreness matches the per-k reference on a mixed graph") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val g = k4 ++ Seq((4L, 10L), (10L, 11L), (11L, 4L), (11L, 12L))
    val got = KCore.coreness(g.toDF("s", "d"), "s", "d", maxK = 5)
      .as[(Long, Long)].collect().toMap
    val want = refCoreness(g, 5).map { case (n, c) => n -> c.toLong }
    assert(got === want)
    // spot meaning: clique nodes 3-core, the 4-10-11 triangle 2-core,
    // the pendant 12 is 1-core
    assert(got(1L) === 3L && got(10L) === 2L && got(12L) === 1L)
  }

  test("a peel round plans as equi-anti-joins, never a loop, with map-side degree combine") {
    import org.apache.spark.sql.execution.FormattedMode
    val cur = (1L to 100L).flatMap(i => Seq((i, i % 7), (i % 7, i)))
      .toDF("u", "v")
    val p = KCore.removeNodes(cur, KCore.badNodes(cur, 3))
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"peel round degenerated to a loop join:\n$p")
    // FormattedMode prints each join once in the tree and once in the
    // node details — count the detail lines, one per physical join
    assert("Join type: LeftAnti".r.findAllIn(p).length === 2,
      s"expected two node-removal anti joins:\n$p")
    // degree aggregate combines before its exchange
    val firstAgg = p.indexOf("HashAggregate")
    val firstEx = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstEx >= 0,
      s"expected aggregate + exchange in the round plan:\n$p")
  }

  test("random graphs agree with the reference (both entry points)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30
      val g = (1 to 120).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      for (k <- Seq(2, 3, 4)) {
        assert(run(g, k) ===
          refKCore(g, k).map { case (a, d) => a -> d.toLong },
          s"trial=$trial k=$k")
      }
      val got = KCore.coreness(g.toDF("s", "d"), "s", "d", maxK = 6)
        .as[(Long, Long)].collect().toMap
      assert(got === refCoreness(g, 6).map { case (a, c) => a -> c.toLong },
        s"trial=$trial coreness")
    }
  }
}
