package graft.operators

import java.sql.{Date, Timestamp}

import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 10:00:00")

  /** n events for user u on the given day. */
  private def burst(u: Long, day: String, n: Int): Seq[(Long, Timestamp)] =
    Seq.fill(n)((u, ts(day)))

  test("flags the day that deviates beyond the threshold") {
    // u1: five 1-event days, then a 7-event day.
    // mean = 2, var = (6*54 - 144)/36 = 5, z = 5/sqrt(5) ~ 2.236
    val ev = ((1 to 5).flatMap(d => burst(1L, s"2024-01-0$d", 1)) ++
      burst(1L, "2024-01-06", 7)).toDF("u", "t")
    val r = Anomaly.dailyOutliers(ev, "u", "t", 2.0, 5)
      .as[(Long, Date, Long, BigDecimal)].collect().toSeq
    assert(r.map(x => (x._1, x._2.toString, x._3)) ==
      Seq((1L, "2024-01-06", 7L)))
    assert((r.head._4 - BigDecimal(5.0 / math.sqrt(5.0))).abs
      < BigDecimal("1e-12"))
  }

  test("a heavy day is only anomalous relative to the entity's own baseline") {
    // u2 has ~7-event days throughout: its 7-event day is NOT an outlier
    // even though u1's identical day is.
    val ev = ((1 to 5).flatMap(d => burst(1L, s"2024-01-0$d", 1)) ++
      burst(1L, "2024-01-06", 7) ++
      (1 to 5).flatMap(d => burst(2L, s"2024-01-0$d", if (d % 2 == 0) 7 else 6)) ++
      burst(2L, "2024-01-06", 7)).toDF("u", "t")
    val r = Anomaly.dailyOutliers(ev, "u", "t", 2.0, 5)
      .as[(Long, Date, Long, BigDecimal)].collect().toSeq
    assert(r.map(_._1).toSet == Set(1L))
  }

  test("constant-activity entities are excluded (sigma = 0)") {
    val ev = (1 to 6).flatMap(d => burst(1L, s"2024-01-0$d", 3))
      .toDF("u", "t")
    assert(Anomaly.dailyOutliers(ev, "u", "t", 0.0, 5).count() == 0L)
  }

  test("entities below the minimum day count are excluded") {
    // 1-1-9 over three days would z-score at ~1.4 with huge leverage;
    // minDays = 5 refuses to score so thin a history
    val ev = (burst(1L, "2024-01-01", 1) ++ burst(1L, "2024-01-02", 1) ++
      burst(1L, "2024-01-03", 9)).toDF("u", "t")
    assert(Anomaly.dailyOutliers(ev, "u", "t", 1.0, 5).count() == 0L)
    assert(Anomaly.dailyOutliers(ev, "u", "t", 1.0, 3).count() == 1L)
  }

  test("negative z-scores (unusually quiet days) are flagged symmetrically") {
    // five 5-event days and one 1-event day: the quiet day is the outlier
    // mean = 26/6, sigma ~ 1.49, z(1) ~ -2.24
    val ev = ((1 to 5).flatMap(d => burst(1L, s"2024-01-0$d", 5)) ++
      burst(1L, "2024-01-06", 1)).toDF("u", "t")
    val r = Anomaly.dailyOutliers(ev, "u", "t", 2.0, 5)
      .as[(Long, Date, Long, BigDecimal)].collect().toSeq
    assert(r.map(x => (x._2.toString, x._3)) == Seq(("2024-01-06", 1L)))
    assert(r.head._4 < BigDecimal(-2))
  }
}
