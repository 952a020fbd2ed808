package graft.operators

import graft.SparkSpec

class GoodTuringSpec extends SparkSpec {
  import spark.implicits._

  // corpus: a..c once, d..e twice, f four times
  // fof: r=1 -> 3 types, r=2 -> 2 types, r=4 -> 1 type; N = 11
  private def corpus() =
    Seq((1L, "a b c d e f"), (2L, "d e f f f")).toDF("doc_id", "text")

  test("frequency-of-frequencies and adjusted counts are exact") {
    val out = CorpusLaws.goodTuring(corpus(), "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getDouble(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 4L))
    val (n1, r1s, m1) = out(1L)
    assert(n1 === 3L)
    assert(r1s.contains(2.0 * 2.0 / 3.0)) // (r+1)·N2/N1
    assert(math.abs(m1 - 3.0 / 11.0) < 1e-15) // P0: unseen-mass estimate
    val (n2, r2s, m2) = out(2L)
    assert(n2 === 2L)
    assert(r2s.isEmpty) // gap: no r = 3 row
    assert(math.abs(m2 - 4.0 / 11.0) < 1e-15)
    val (n4, r4s, m4) = out(4L)
    assert(n4 === 1L && r4s.isEmpty) // tail
    assert(math.abs(m4 - 4.0 / 11.0) < 1e-15)
  }

  test("mass column sums to 1 over the table") {
    val total = CorpusLaws.goodTuring(corpus(), "text")
      .agg(org.apache.spark.sql.functions.sum("mass"))
      .head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-12)
  }

  test("deterministic under repartitioning") {
    val df = (1 to 80).map(i =>
      (i.toLong, s"t${i % 13} t${i % 7} t${i % 5}")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusLaws.goodTuring(d, "text").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(df) === run(df.repartition(9)))
  }
}
