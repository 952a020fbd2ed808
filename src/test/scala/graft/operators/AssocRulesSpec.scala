package graft.operators

import graft.SparkSpec

class AssocRulesSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets: {x,y} together 3 times, z rides along once, y alone once.
  private val baskets = Seq(
    (1L, "x"), (1L, "y"),
    (2L, "x"), (2L, "y"), (2L, "z"),
    (3L, "x"), (3L, "y"),
    (4L, "y")).toDF("b", "i")

  test("support, confidence, and lift on a known basket set") {
    val out = AssocRules.pairRules(baskets, "b", "i", minPairs = 2L)
      .as[(String, String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // only the (x,y) pair survives minPairs=2, in both directions
    assert(out.keySet == Set(("x", "y"), ("y", "x")))
    val (_, _, nPair, nAnte, nCons, nB, sup, conf, lift) = out(("x", "y"))
    assert(nPair == 3L && nAnte == 3L && nCons == 4L && nB == 4L)
    assert(sup == 3.0 / 4.0)
    assert(conf == 3.0 / 3.0)           // every x basket has y
    assert(lift == 3.0 * 4.0 / (3.0 * 4.0))
    val rev = out(("y", "x"))
    assert(rev._7 == 3.0 / 4.0 && rev._8 == 3.0 / 4.0 && rev._9 == 1.0)
  }

  test("duplicate basket lines count once; canonical pair only") {
    val dup = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
      .toDF("b", "i")
    val out = AssocRules.pairRules(dup, "b", "i", 2L)
      .as[(String, String, Long, Long, Long, Long, Double, Double, Double)]
      .collect()
    assert(out.length == 2) // x->y and y->x, n_pair 2 despite the dup line
    assert(out.forall(_._3 == 2L))
  }

  test("minPairs filters before rule expansion") {
    val out = AssocRules.pairRules(baskets, "b", "i", 4L)
    assert(out.count() == 0)
  }

  test("null baskets and items are ignored") {
    val withNulls = Seq(
      (Some(1L), Some("x")), (Some(1L), Some("y")),
      (Some(2L), Some("x")), (Some(2L), Some("y")),
      (None, Some("x")), (Some(3L), None))
      .toDF("b", "i")
    val out = AssocRules.pairRules(withNulls, "b", "i", 2L)
      .as[(String, String, Long, Long, Long, Long, Double, Double, Double)]
      .collect()
    // n_baskets counts only non-null baskets that carry a non-null item
    assert(out.forall(_._6 == 2L))
    assert(out.map(r => (r._1, r._2)).toSet == Set(("x", "y"), ("y", "x")))
  }
}
