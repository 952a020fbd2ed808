package graft.operators

import graft.SparkSpec

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (100000L, 0L), (900000L, 1L), (600000L, 1L), (600000L, 0L))

  test("reliability: hand-computed bins and exact ECE") {
    val out = Calibration.reliability(
        rows.toDF("score_micro", "y"), "score_micro", "y", 10)
      .select("bin", "n", "n_pos", "score_micro_sum", "conf", "acc",
        "ece_num", "ece")
      .as[(Int, Long, Long, Long, Double, Double, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1) == ((1, 1L, 0L, 100000L, 0.1, 0.0, 400000L, 0.1)))
    assert(out(6) == ((6, 2L, 1L, 1200000L, 0.6, 0.5, 400000L, 0.1)))
    assert(out(9) == ((9, 1L, 1L, 900000L, 0.9, 1.0, 400000L, 0.1)))
    assert(out.size == 3) // empty bins absent
  }

  test("reliability: score 1e6 clamps into the top bin") {
    val out = Calibration.reliability(
        Seq((1000000L, 1L)).toDF("score_micro", "y"), "score_micro", "y", 10)
      .select("bin").as[Int].collect()
    assert(out.toSeq == Seq(9))
  }

  test("binCounts: out-of-range score_micro raises, not a skewed bin") {
    val bad = Seq((-5L, 0L), (500000L, 1L)).toDF("score_micro", "y")
    def raisesRange(thunk: => Unit): Unit = {
      val ex = intercept[Exception](thunk)
      assert(ex.getMessage.contains("out of [0, 1e6]") ||
        Option(ex.getCause).exists(_.getMessage.contains("out of [0, 1e6]")))
    }
    raisesRange(Calibration.binCounts(bad, "score_micro", "y", 10).collect())
    val high = Seq((1000001L, 1L)).toDF("score_micro", "y")
    raisesRange(Calibration.binCounts(high, "score_micro", "y", 10).collect())
  }

  test("isotonicFromBins: an unbounded frame fails fast at the cap") {
    val notBins = (0 to 99).map(i => (i, 10L, 5L)).toDF("bin", "n", "n_pos")
    val ex = intercept[IllegalArgumentException] {
      Calibration.isotonicFromBins(notBins, maxBins = 50)
    }
    assert(ex.getMessage.contains("bounded-collect contract"))
    // within the cap the PAV fit is unchanged
    assert(Calibration.isotonicFromBins(notBins, maxBins = 100)
      .count() === 100L)
  }

  test("brier: hand-computed mean squared error") {
    val out = Calibration.brier(
        rows.toDF("score_micro", "y"), "score_micro", "y")
      .select("n", "brier").as[(Long, Double)].collect().head
    // (0.01 + 0.01 + 0.16 + 0.36) / 4
    assert(out == ((4L, 0.135)))
  }

  test("confusion at 0.5: counts and single-division metrics") {
    val out = Calibration.confusionAt(
        rows.toDF("score_micro", "y"), "score_micro", "y", 500000L)
      .select("tp", "fp", "tn", "fn", "accuracy", "precision", "recall",
        "f1")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(out == ((2L, 1L, 1L, 0L, 0.75, 2.0 / 3.0, 1.0, 0.8)))
  }

  test("evalAt fuses brier and confusionAt without changing a value") {
    val df = rows.toDF("score_micro", "y")
    val fused = Calibration.evalAt(df, "score_micro", "y", 500000L)
    val composed = Calibration.brier(df, "score_micro", "y")
      .crossJoin(Calibration.confusionAt(df, "score_micro", "y", 500000L))
    assert(fused.columns.toSeq == composed.columns.toSeq)
    assert(fused.collect().toSeq == composed.collect().toSeq)
  }

  test("isotonic PAV pools exactly the violating bins") {
    // bin rates 0.1, 0.5, 0.3, 0.9: bins 1 and 2 violate monotonicity
    // and pool to 8/20 = 0.4; the ends stay untouched.
    val rel = Seq((0, 10L, 1L), (1, 10L, 5L), (2, 10L, 3L), (3, 10L, 9L))
      .toDF("bin", "n", "n_pos")
    val out = Calibration.isotonicFromBins(rel)
      .select("bin", "cal_n", "cal_pos", "cal_p")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0, 10L, 1L, 0.1), (1, 20L, 8L, 0.4),
      (2, 20L, 8L, 0.4), (3, 10L, 9L, 0.9)))
  }

  test("isotonic: cascading violations pool transitively; mass preserved") {
    // 0.9, 0.5, 0.1 all collapse into one block 15/30 = 0.5.
    val rel = Seq((0, 10L, 9L), (1, 10L, 5L), (2, 10L, 1L))
      .toDF("bin", "n", "n_pos")
    val out = Calibration.isotonicFromBins(rel)
      .select("bin", "cal_p").as[(Int, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0, 0.5), (1, 0.5), (2, 0.5)))
  }

  test("isotonic of an already-monotone table is the identity") {
    val rel = Seq((0, 4L, 1L), (1, 4L, 2L), (2, 4L, 3L))
      .toDF("bin", "n", "n_pos")
    val out = Calibration.isotonicFromBins(rel)
      .select("bin", "cal_p").as[(Int, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0, 0.25), (1, 0.5), (2, 0.75)))
  }

  test("calibrate joins cal_p by bin; unseen bins surface as null") {
    val rel = Calibration.reliability(
      rows.toDF("score_micro", "y"), "score_micro", "y", 10)
    val mapping = Calibration.isotonicFromBins(rel)
    val probes = Seq((150000L, 0L), (650000L, 1L), (50000L, 0L))
      .toDF("score_micro", "y")
    val out = Calibration.calibrate(probes, "score_micro", mapping, 10)
      .select("score_micro", "cal_p")
      .as[(Long, Option[Double])].collect().toMap
    // fitted bins: 1 (acc 0), 6 (acc 0.5), 9 (acc 1) — PAV keeps them.
    assert(out(150000L).contains(0.0))
    assert(out(650000L).contains(0.5))
    assert(out(50000L).isEmpty) // bin 0 never seen at fit time
  }

  test("confusion: zero denominators yield NULL, not a crash") {
    // No positives anywhere and a threshold above every score: tp+fp=0
    // (precision NULL), tp+fn=0 (recall NULL), f1 NULL.
    val out = Calibration.confusionAt(
        Seq((100000L, 0L), (200000L, 0L)).toDF("score_micro", "y"),
        "score_micro", "y", 900000L)
      .select("tp", "fp", "tn", "fn", "accuracy", "precision", "recall",
        "f1")
      .collect().head
    assert(out.getLong(0) == 0L && out.getLong(1) == 0L)
    assert(out.getLong(2) == 2L && out.getLong(3) == 0L)
    assert(out.getDouble(4) == 1.0)
    assert(out.isNullAt(5) && out.isNullAt(6) && out.isNullAt(7))
  }
}
