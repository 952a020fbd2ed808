package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {

  import spark.implicits._

  test("riskTable matches the hand-computed KM risk set") {
    // durations: 5(event) 5(cens) 7(event) 9(cens) 9(event) 9(event)
    val labels = Seq((5L, 1), (5L, 0), (7L, 1), (9L, 0), (9L, 1), (9L, 1))
      .toDF("duration_us", "converted")
    val out = Survival.riskTable(labels, "duration_us", "converted")
      .orderBy("t")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (5L, 6L, 1L, 1L),   // everyone at risk at the earliest time
      (7L, 4L, 1L, 0L),   // 7,9,9,9 remain
      (9L, 3L, 2L, 1L)))  // two events + one censoring at 9
  }

  test("cumulativeHazard: hand-computed Nelson-Aalen micro table") {
    // risk table (from the first test): (5,6,1), (7,4,1), (9,3,2)
    // h: 1e6/6=166666, 1e6/4=250000, 2e6/3=666666 (integral div)
    // H: 166666, 416666, 1083332
    val labels = Seq((5L, 1), (5L, 0), (7L, 1), (9L, 0), (9L, 1), (9L, 1))
      .toDF("duration_us", "converted")
    val out = Survival.cumulativeHazard(labels, "duration_us", "converted")
      .orderBy("t").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (5L, 6L, 1L, 166666L, 166666L),
      (7L, 4L, 1L, 250000L, 416666L),
      (9L, 3L, 2L, 666666L, 1083332L)))
  }

  test("cumulativeHazard is monotone non-decreasing in t") {
    val labels = (1 to 200).map(i => ((i % 13).toLong, i % 2))
      .toDF("dur", "ev")
    val h = Survival.cumulativeHazard(labels, "dur", "ev")
      .orderBy("t").select("cum_hazard_micro").as[Long].collect()
    assert(h.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("riskTable drops censoring-only times from the output") {
    val labels = Seq((1L, 0), (2L, 1), (3L, 0)).toDF("dur", "ev")
    val out = Survival.riskTable(labels, "dur", "ev")
      .orderBy("t").as[(Long, Long, Long, Long)].collect().toSeq
    // t=1 and t=3 have no events -> absent; but t=1's subject still
    // counts toward the risk set at t<=1... (t=2: durations >=2 are 2,3)
    assert(out === Seq((2L, 2L, 1L, 0L)))
  }

  test("riskTable risk counts are descending-cumulative (no cross join)") {
    val labels = (1 to 100).map(i => (i.toLong % 10, i % 3 min 1))
      .toDF("dur", "ev")
    val rt = Survival.riskTable(labels, "dur", "ev")
    val p = rt.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"cross join in plan:\n$p")
    // n_at_risk strictly decreases as t increases (all durations distinct
    // rows contribute to earlier risk sets)
    val rows = rt.orderBy("t").as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) > w(1)))
  }

  test("durationBucket bounds the window input on continuous durations") {
    // microsecond-ish continuous durations: every value distinct, so the
    // unbinned risk table would be cohort-sized — the scale hazard the
    // bucket parameter exists for
    val n = 5000
    val labels = (1 to n)
      .map(i => (i * 0.9973 + (i % 7) * 0.0001, i % 2))
      .toDF("dur", "ev")
    val bucketed = Survival.riskTable(labels, "dur", "ev",
      durationBucket = Some(500.0))
    val rows = bucketed.orderBy("t")
      .as[(Double, Long, Long, Long)].collect().toSeq
    // ~n*0.9973 max -> 10 buckets of width 500, NOT 5000 distinct times
    assert(rows.size <= 10, s"expected <=10 binned rows, got ${rows.size}")
    // binning preserves the cohort: risk set at the earliest bin is n
    assert(rows.head._2 === n.toLong)
    // events are conserved across bins
    assert(rows.map(_._3).sum === (1 to n).count(_ % 2 == 1).toLong)
    // bin edges are multiples of the bucket
    assert(rows.forall { case (t, _, _, _) => t % 500.0 == 0.0 })
    // and the binned table equals the unbinned table computed over
    // pre-floored durations — the parameter is pure sugar for the
    // documented bin-upstream contract
    // CAST: in SQL text '500.0' is a DECIMAL literal, and
    // bigint * decimal(4,1) widens to decimal(25,1); the DataFrame path
    // uses lit(500.0) = DOUBLE, so align the types for the equality
    val preFloored = labels
      .selectExpr("CAST(floor(dur / 500.0) * 500.0 AS DOUBLE) AS dur", "ev")
    val manual = Survival.riskTable(preFloored, "dur", "ev")
      .orderBy("t").as[(Double, Long, Long, Long)].collect().toSeq
    assert(rows === manual)
    intercept[IllegalArgumentException] {
      Survival.riskTable(labels, "dur", "ev", durationBucket = Some(0.0))
    }
  }

  private def lr(rows: Seq[(String, Long, Int)],
      bucket: Option[Double] = None) =
    Survival.logRank(rows.toDF("g", "dur", "ev"), "dur", "ev", "g",
      "a", "b", bucket)
      .select("n_a", "n_b", "o_a", "o_b", "e_a_micro", "v_micro", "chi2")
      .as[(Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().head

  test("logRank matches the hand-computed two-cohort statistic") {
    // a: events at 1, 2; b: censored at 1, event at 3.
    // t=1: N=4, d=1, E=0.5, V=0.25; t=2: N=2, d=1, E=0.5, V=0.25;
    // t=3: N=1 -> V term 0. chi2 = (2 - 1)^2 / 0.5 = 2.
    val out = lr(Seq(("a", 1L, 1), ("a", 2L, 1), ("b", 1L, 0),
      ("b", 3L, 1)))
    assert(out == ((2L, 2L, 2L, 1L, 1000000L, 500000L, Some(2.0))))
  }

  test("logRank on identical cohorts is exactly zero") {
    val out = lr(Seq(("a", 1L, 1), ("a", 2L, 1), ("b", 1L, 1),
      ("b", 2L, 1)))
    assert(out._5 == 2000000L && out._7.contains(0.0))
  }

  test("logRank: degenerate variance yields null, not a crash") {
    // one subject per arm at distinct times: every event time has N=1
    // after the first... t=1: N=2, d=1 -> V=1*1*1*1/(4*1)=0.25. Use a
    // truly degenerate shape instead: a single subject total.
    val out = lr(Seq(("a", 1L, 1)))
    assert(out._6 == 0L && out._7.isEmpty)
  }

  test("logRank bins durations and ignores other groups") {
    // bucket 1.0 merges 1.1 and 1.9 into t=1.0; group 'c' is excluded.
    val out = lr(Seq(("a", 1L, 1), ("b", 1L, 1), ("c", 50L, 1)),
      bucket = Some(2.0))
    // both land at t=0.0: N=2, d=2, E_A = 2*1/2 = 1, V = 0 (N-d = 0).
    assert(out._1 == 1L && out._2 == 1L && out._5 == 1000000L)
    assert(out._6 == 0L && out._7.isEmpty)
  }

  test("kaplanMeier: hand-computed product-limit steps") {
    // (1,e)(2,c)(3,e)(4,e)(5,c): S(1)=4/5, S(3)=4/5*2/3, S(4)=.../2
    val labels = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 1), (5L, 0))
      .toDF("dur", "ev")
    val km = Survival.kaplanMeier(labels, "dur", "ev")
      .select("t", "n_at_risk", "d", "s")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(km.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, 5L, 1L), (3L, 3L, 1L), (4L, 2L, 1L)))
    val s = km.map(_._4)
    assert(math.abs(s(0) - 0.8) < 1e-9)
    assert(math.abs(s(1) - 0.8 * 2.0 / 3.0) < 1e-9)
    assert(math.abs(s(2) - 0.8 * 2.0 / 3.0 / 2.0) < 1e-9)
  }

  test("kaplanMeier: exhausted risk set zeroes the curve from there on") {
    // t=2 kills everyone at risk: S(2) = 0 exactly, log_s null
    val labels = Seq((1L, 1), (2L, 1), (2L, 1)).toDF("dur", "ev")
    val km = Survival.kaplanMeier(labels, "dur", "ev")
      .select("t", "s", "log_s")
      .as[(Long, Double, Option[Double])].collect().sortBy(_._1)
    assert(math.abs(km(0)._2 - 2.0 / 3.0) < 1e-9)
    assert(km(1)._2 === 0.0 && km(1)._3.isEmpty)
  }

  test("rmst: step-function integral with head rectangle and horizon clamp") {
    val labels = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 1), (5L, 0))
      .toDF("dur", "ev")
    val km = Survival.kaplanMeier(labels, "dur", "ev")
    // [0,1)*1 + [1,3)*0.8 + [3,4)*0.5333 + [4,6)*0.26667 = 3.66667
    val r6 = Survival.rmst(km, 6.0).select("rmst").as[Double].head()
    assert(math.abs(r6 - (1.0 + 1.6 + 0.8 * 2 / 3 + 2 * 0.8 / 3)) < 1e-5)
    // horizon before the first event: the whole integral is S=1
    val rHalf = Survival.rmst(km, 0.5).select("rmst").as[Double].head()
    assert(math.abs(rHalf - 0.5) < 1e-9)
  }
}
