package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  /** Both orientations of an undirected edge list. */
  private def undirected(pairs: Seq[(Long, Long)]) = {
    val df = pairs.toDF("src", "dst")
    df.union(df.select(col("dst"), col("src")))
  }

  test("two cliques joined by a bridge resolve to two communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3–10
    val e = undirected(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)))
    val got = LabelProp.run(e, "src", "dst", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // min-label tie-break floods each clique from its smallest member
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(10L) === got(11L) && got(11L) === got(12L))
    assert(got(1L) !== got(10L))
  }

  test("deterministic: two runs produce identical assignments") {
    val e = undirected(
      (1L to 30L).map(i => (i, i % 7 + 100L)) ++ Seq((100L, 101L)))
    val a = LabelProp.run(e, "src", "dst", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = LabelProp.run(e, "src", "dst", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a === b)
  }

  test("frequency beats label value; label value breaks frequency ties") {
    // node 9's in-neighbours after round 1 carry labels {5,5,1}: the
    // frequent 5 must win over the smaller 1. Star edges INTO 9 only,
    // so round 1 reads initial labels directly.
    val e = Seq((9L, 5L), (9L, 6L), (9L, 1L), (6L, 5L))
      .toDF("src", "dst") // edges point src←dst semantics: src adopts dst labels
    // round 1: node 9 sees dst labels {5, 6, 1} — all distinct, tie on
    // frequency → smallest label 1 wins
    val r1 = LabelProp.run(e, "src", "dst", 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(9L) === 1L)
    // make 5 frequent: two in-edges from label-5 nodes
    val e2 = Seq((9L, 5L), (9L, 7L), (9L, 1L), (7L, 7L)).toDF("src", "dst")
      .union(Seq((9L, 5L)).toDF("src", "dst")) // duplicate edge = weight 2
    val r2 = LabelProp.run(e2, "src", "dst", 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(9L) === 5L)
  }

  test("a node with no in-edges keeps its own label") {
    val e = Seq((1L, 2L)).toDF("src", "dst") // 2 has no in-edges
    val got = LabelProp.run(e, "src", "dst", 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) === 2L && got(1L) === 2L)
  }

  test("equivariance: an order-preserving node relabeling maps through") {
    // g(x) = 2x + 10 preserves ordering, so the min-label tie-break
    // commutes with it: run(g(edges)) == g(run(edges))
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L),
      (10L, 12L), (11L, 12L), (3L, 10L), (5L, 1L))
    def g(x: Long) = 2 * x + 10
    val direct = LabelProp.run(undirected(pairs), "src", "dst", 3)
      .collect().map(r => g(r.getLong(0)) -> g(r.getLong(1))).toMap
    val mapped = LabelProp.run(
      undirected(pairs.map { case (a, b) => (g(a), g(b)) }),
      "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct === mapped)
  }

  test("a round plans as equi-joins with no loop join") {
    import org.apache.spark.sql.execution.FormattedMode
    val e = undirected((1L to 50L).map(i => (i, i % 5)))
    val labels = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .select(col("node"), col("node").as("label"))
    val p = LabelProp.round(e, labels)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"label-prop round degenerated to a loop join:\n$p")
  }
}
