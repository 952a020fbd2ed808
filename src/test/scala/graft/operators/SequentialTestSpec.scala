package graft.operators

import graft.SparkSpec

class SequentialTestSpec extends SparkSpec {
  import spark.implicits._

  private val design = SequentialTest.Design(0.2, 0.8, 0.05, 0.05)

  private def runs(outcomes: Int*) =
    outcomes.zipWithIndex.map { case (o, i) =>
      ("k", i.toLong, o.toLong)
    }.toDF("k", "t", "y")

  test("a decisive win streak crosses the upper bound at the exact step") {
    // win increment ln(4) ≈ 1.386e6 micro; upper ln(19) ≈ 2.944e6:
    // the third win is the first crossing
    val out = SequentialTest.sprt(runs(1, 1, 1, 1, 1), "k", Seq("t"),
      "y", design).collect().head
    assert(out.getString(3) === "h1")
    assert(out.getLong(4) === 3L)
  }

  test("a loss streak mirrors to h0 at the same step") {
    val out = SequentialTest.sprt(runs(0, 0, 0, 0), "k", Seq("t"),
      "y", design).collect().head
    assert(out.getString(3) === "h0")
    assert(out.getLong(4) === 3L)
  }

  test("a balanced walk stays in 'continue' with the exact final llr") {
    val out = SequentialTest.sprt(runs(1, 0, 1, 0), "k", Seq("t"),
      "y", design)
      .select("n", "llr_final", "decision", "n_decide").collect().head
    assert(out.getLong(0) === 4L)
    val expect = (2 * design.winMicro + 2 * design.loseMicro) / 1.0e6
    assert(out.getDouble(1) === expect)
    assert(out.getString(2) === "continue")
    assert(out.isNullAt(3)) // no crossing index while continuing
  }

  test("the decision depends on order, not just totals") {
    // same totals, different order: early streak decides, shuffled
    // arrangement of the SAME outcomes may not (sequential semantics)
    val early = SequentialTest.sprt(runs(1, 1, 1, 0, 0, 0), "k",
      Seq("t"), "y", design).collect().head
    assert(early.getString(3) === "h1") // crossed before the losses
    val late = SequentialTest.sprt(runs(1, 0, 1, 0, 1, 0), "k",
      Seq("t"), "y", design).collect().head
    assert(late.getString(3) === "continue")
  }

  test("deterministic under repartitioning") {
    val df = (0 until 200).map(i =>
      ("k", i.toLong, (i % 3 == 0).compare(false).toLong))
      .toDF("k", "t", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      SequentialTest.sprt(d, "k", Seq("t"), "y", design)
        .select("llr_final", "decision").as[(Double, String)].head()
    assert(run(df) === run(df.repartition(7)))
  }
}
