package graft.operators

import graft.SparkSpec

class PermutationTestSpec extends SparkSpec {
  import spark.implicits._

  private def diffs(vals: (Long, Double)*) =
    vals.toDF("id", "diff")

  test("all-zero differences are never extreme-free: p = 1") {
    val r = Bootstrap.pairedSignPermutation(
      diffs((1L, 0.0), (2L, 0.0), (3L, 0.0)), "id", "diff", 16)
      .select("n_pairs", "n_extreme", "p_value")
      .as[(Long, Long, Double)].head()
    assert(r._1 === 3L)
    assert(r._2 === 16L) // every |T_r| = 0 >= |T_obs| = 0
    assert(r._3 === 1.0)
  }

  test("a strong one-sided shift yields a small p") {
    val d = diffs((1 to 12).map(i => (i.toLong, 10.0)): _*)
    val r = Bootstrap.pairedSignPermutation(d, "id", "diff", 64)
      .select("t_obs", "p_value").as[(Double, Double)].head()
    assert(r._1 === 120.0)
    // T_r matches 120 only when the md5 parity draw flips nothing
    // (or everything): p must sit near the 1/65 floor, far below 0.5
    assert(r._2 < 0.2)
  }

  test("p is invariant under global sign flip of the differences") {
    val d = diffs((1 to 9).map(i => (i.toLong, i * 1.5)): _*)
    val neg = diffs((1 to 9).map(i => (i.toLong, -i * 1.5)): _*)
    val p1 = Bootstrap.pairedSignPermutation(d, "id", "diff", 32)
      .select("p_value").as[Double].head()
    val p2 = Bootstrap.pairedSignPermutation(neg, "id", "diff", 32)
      .select("p_value").as[Double].head()
    assert(p1 === p2) // |T_r| and |T_obs| both flip-invariant
  }

  test("deterministic across reruns and repartitionings") {
    val d = diffs((1 to 50).map(i =>
      (i.toLong, (i % 7) - 3.0)): _*)
    def run(df: org.apache.spark.sql.DataFrame) =
      Bootstrap.pairedSignPermutation(df, "id", "diff", 32)
        .select("t_obs", "n_extreme", "p_value")
        .as[(Double, Long, Double)].head()
    assert(run(d) === run(d.repartition(5)))
  }

  test("null ids and null diffs are dropped from the pair set") {
    val d = Seq((Some(1L), Some(2.0)), (None, Some(5.0)),
      (Some(3L), None), (Some(4L), Some(-2.0))).toDF("id", "diff")
    val n = Bootstrap.pairedSignPermutation(d, "id", "diff", 8)
      .select("n_pairs").as[Long].head()
    assert(n === 2L)
  }
}
