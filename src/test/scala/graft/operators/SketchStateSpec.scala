package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchStateSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1 to 600).map { i =>
    (s"d${i % 3}", (i % 97).toLong) // 3 days, 97 distinct users, overlap
  }.toDF("day", "user")

  test("estimate from built state equals the exact distinct count " +
      "(sparse-exact regime)") {
    val state = SketchState.build(rows, Seq("day"), "user")
    val est = SketchState.estimate(state, Seq("day"))
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy($"day").agg(countDistinct($"user").as("n"))
      .as[(String, Long)].collect().toMap
    assert(est == exact)
  }

  test("rollup across keys unions, not sums — overlapping users count once") {
    val state = SketchState.build(rows, Seq("day"), "user")
    val total = SketchState.estimate(state, Seq.empty)
      .as[Long].collect().head
    assert(total == 97L) // NOT 3 x ~97
  }

  test("per-batch state merges into exactly the full-rebuild state") {
    val (b1, b2) = ((1 to 300), (301 to 600))
    def df(r: Range) = r.map(i => (s"d${i % 3}", (i % 97).toLong))
      .toDF("day", "user")
    val merged = SketchState.merge(
      SketchState.build(df(b1), Seq("day"), "user"),
      SketchState.build(df(b2), Seq("day"), "user"), Seq("day"))
    val rebuilt = SketchState.build(df(1 to 600), Seq("day"), "user")
    val a = SketchState.estimate(merged, Seq("day"))
      .as[(String, Long)].collect().toMap
    val b = SketchState.estimate(rebuilt, Seq("day"))
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("estimates are partitioning-invariant") {
    val a = SketchState.estimate(
      SketchState.build(rows, Seq("day"), "user"), Seq("day"))
      .as[(String, Long)].collect().toMap
    val b = SketchState.estimate(
      SketchState.build(rows.repartition(17), Seq("day"), "user"), Seq("day"))
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("large cardinality stays within the published error bound") {
    val big = (1L to 200000L).map(i => ("k", i)).toDF("day", "user")
    val est = SketchState.estimate(
      SketchState.build(big, Seq("day"), "user"), Seq("day"))
      .as[(String, Long)].collect().head._2
    // lgK=12 -> rse ~1.04/sqrt(4096) = 1.6%; allow 3 sigma
    assert(math.abs(est - 200000.0) / 200000.0 < 0.05, s"estimate $est")
  }

  test("null values are excluded from the sketch") {
    val df = Seq(("d", Some(1L)), ("d", None), ("d", Some(2L)))
      .toDF("day", "user")
    val est = SketchState.estimate(
      SketchState.build(df, Seq("day"), "user"), Seq("day"))
      .as[(String, Long)].collect().head._2
    assert(est == 2L)
  }
}
