package graft.operators

import graft.SparkSpec

class BlockingSpec extends SparkSpec {
  import spark.implicits._

  private def q(records: Seq[Long], cand: Seq[(Long, Long)],
      truth: Seq[(Long, Long)]) =
    Blocking.quality(records.toDF("id"),
      cand.toDF("a", "b"), truth.toDF("a", "b"), "a", "b")
      .select("n_records", "n_all_pairs", "n_candidates", "n_truth",
        "n_found", "reduction_ppm", "completeness_ppm")
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().head

  test("hand-computed reduction and completeness") {
    // 5 records -> 10 pairs; blocker emits 4 candidates; 3 true pairs,
    // 2 of them survive the blocker.
    val out = q(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
      Seq((1L, 2L), (2L, 3L), (1L, 5L)))
    assert(out == ((5L, 10L, 4L, 3L, 2L,
      Some(600000L), Some(666666L))))
  }

  test("lossless blocker scores exactly 1e6 completeness") {
    val truth = Seq((1L, 2L), (3L, 4L))
    val out = q(Seq(1L, 2L, 3L, 4L), truth ++ Seq((1L, 3L)), truth)
    assert(out._5 == 2L && out._7.contains(1000000L))
  }

  test("duplicate pairs in inputs count once") {
    val out = q(Seq(1L, 2L, 3L),
      Seq((1L, 2L), (1L, 2L)), Seq((1L, 2L), (1L, 2L)))
    assert(out._3 == 1L && out._4 == 1L && out._5 == 1L)
  }

  test("degenerate inputs: empty truth and single record yield nulls") {
    // n=1 -> 0 pairs: reduction undefined (null); empty truth ->
    // completeness null
    val o = q(Seq(1L), Seq.empty, Seq.empty)
    assert(o._1 == 1L && o._2 == 0L && o._6.isEmpty && o._7.isEmpty)
  }
}
