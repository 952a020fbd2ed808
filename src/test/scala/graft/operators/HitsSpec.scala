package graft.operators

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], iters: Int) =
    Hits.run(edges.toDF("s", "d"), "s", "d", iters)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("one round on a tiny bipartite graph, hand-computed") {
    // c1->s1, c2->s1, c2->s2
    // auth raw: s1=2, s2=1, c*=0 -> max 2 -> s1=1, s2=0.5
    // hub raw: c1=auth(s1)=1, c2=1+0.5=1.5 -> max 1.5 -> c1=1/1.5, c2=1
    val out = run(Seq(("c1", "s1"), ("c2", "s1"), ("c2", "s2")), 1)
    assert(out("s1") === ((0.0, 1.0)))
    assert(out("s2") === ((0.0, 0.5)))
    assert(out("c2") === ((1.0, 0.0)))
    assert(out("c1")._1 === 1.0 / 1.5 && out("c1")._2 === 0.0)
  }

  test("max normalization: both score columns peak at exactly 1") {
    val edges = for { c <- 1 to 5; s <- 1 to c } yield (s"c$c", s"s$s")
    val out = run(edges, 3)
    assert(out.values.map(_._1).max === 1.0)
    assert(out.values.map(_._2).max === 1.0)
    assert(out.values.forall { case (h, a) =>
      h >= 0.0 && h <= 1.0 && a >= 0.0 && a <= 1.0 })
  }

  test("sources have zero authority, sinks zero hub") {
    val out = run(Seq(("a", "b"), ("b", "c")), 2)
    assert(out("a")._2 === 0.0) // nothing points at a
    assert(out("c")._1 === 0.0) // c points at nothing
  }

  test("parallel edges contribute once each") {
    // doubled edge c1->s1 gives s1 twice c2->s2's raw mass
    val out = run(Seq(("c1", "s1"), ("c1", "s1"), ("c2", "s2")), 1)
    assert(out("s1")._2 === 1.0 && out("s2")._2 === 0.5)
  }

  test("in-degree past the old BIGINT headroom does not wrap (ADVICE r11)") {
    // 40,000 sources -> 1 sink: round-1 auth(sink) = 40000·2^48, which
    // overflows a signed long (~32k·2^48) — the DECIMAL(38,0) widening
    // must keep the sink the (only) authority at exactly 1.0 and every
    // source at hub exactly 1.0 (all hubs equal after maxnorm).
    val edges = (1 to 40000).map(i => (s"c$i", "sink"))
    val out = run(edges, 1)
    assert(out("sink") === ((0.0, 1.0)))
    assert(out("c1") === ((1.0, 0.0)))
    assert(out("c40000")._1 === 1.0)
  }

  test("hub ranking separates sides where symmetrized PageRank cannot") {
    // c_big buys from every supplier; c_small from one. HITS must rank
    // c_big's hub strictly higher and keep all supplier hubs at 0.
    val edges = (1 to 4).map(s => ("c_big", s"s$s")) :+ ("c_small", "s1")
    val out = run(edges, 2)
    assert(out("c_big")._1 > out("c_small")._1)
    (1 to 4).foreach(s => assert(out(s"s$s")._1 === 0.0))
  }
}
