package graft.operators

import graft.SparkSpec

class PropensityMatchSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean, Long)], caliper: Long) =
    PropensityMatch.nearestByScore(
        rows.toDF("id", "treat", "score"), "id", "treat", "score", caliper)
      .select("id_t", "id_c", "dist")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("each treated unit takes its nearest control; exact distances") {
    // treated at 100, 250; controls at 90, 180, 260
    val rows = Seq(
      (1L, true, 100L), (2L, true, 250L),
      (10L, false, 90L), (11L, false, 180L), (12L, false, 260L))
    val m = run(rows, caliper = 100L)
    assert(m(1L) == (10L, 10L)) // |100-90|=10 beats |100-180|=80
    assert(m(2L) == (12L, 10L)) // |250-260|=10 beats |250-180|=70
  }

  test("ties break to the smallest control id; caliper excludes") {
    val rows = Seq(
      (1L, true, 100L),
      (20L, false, 90L), (10L, false, 110L), // equidistant -> id 10
      (2L, true, 1000L),                      // nothing within caliper
      (30L, false, 940L))
    val m = run(rows, caliper = 50L)
    assert(m(1L) == (10L, 10L))
    assert(!m.contains(2L), "control outside the caliper must not match")
  }

  test("matching is with replacement and crosses bucket boundaries") {
    // one control serves two treated; pairs straddle the bucket edge
    // (caliper 100 -> buckets [0,100), [100,200): t=95 in bucket 0
    // matches c=105 in bucket 1 through the adjacent-bucket probe)
    val rows = Seq(
      (1L, true, 95L), (2L, true, 115L), (10L, false, 105L))
    val m = run(rows, caliper = 100L)
    assert(m(1L) == (10L, 10L) && m(2L) == (10L, 10L))
  }

  test("negative scores bucket correctly (signed floor division)") {
    val rows = Seq(
      (1L, true, -95L), (10L, false, -105L), (11L, false, 205L))
    val m = run(rows, caliper = 100L)
    assert(m(1L) == (10L, 10L))
  }

  test("deterministic under repartitioning") {
    val rows = (0 until 400).map { i =>
      (i.toLong, i % 3 == 0, ((i * 7919) % 997).toLong)
    }
    def go(parts: Int) = PropensityMatch.nearestByScore(
        rows.toDF("id", "treat", "score").repartition(parts),
        "id", "treat", "score", 25L)
      .select("id_t", "id_c", "dist").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val a = go(2)
    assert(a.nonEmpty)
    assert(a == go(11))
    // brute-force cross-check: global (dist, id_c) argmin within caliper
    val treated = rows.filter(_._2)
    val controls = rows.filterNot(_._2)
    val brute = treated.flatMap { case (it, _, st) =>
      val cands = controls.map { case (ic, _, sc) =>
        (math.abs(st - sc), ic) }.filter(_._1 <= 25L)
      if (cands.isEmpty) None else Some((it, cands.min._2, cands.min._1))
    }.sortBy(_._1)
    assert(a == brute)
  }
}
