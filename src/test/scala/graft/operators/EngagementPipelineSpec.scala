package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-family composition: the engagement-analytics chain a curation
  * team actually runs — raw events → streak labels (gaps-and-islands)
  * → join a spend metric → per-segment rank statistics (Kendall tau-b)
  * → robust trend (Theil–Sen) — one lazy plan end to end, rerun-
  * deterministic, with the rank layer immune to a magnitude outlier
  * that would wreck Pearson/OLS (the reason this family exists).
  */
class EngagementPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, h: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("events -> streaks -> kendall + theil-sen, one deterministic chain") {
    // user k (1..5, segment a; 6..10, segment b) is active on k
    // consecutive days -> longest_streak = k (within-segment rank k)
    val events = (1 to 10).flatMap { u =>
      val days = if (u <= 5) u else u - 5
      (1 to days).map(d => (u.toLong, ts(d, 9 + (u % 3))))
    }.toDF("user_id", "ts")
    // spend strictly increases with streak rank; the top-b user is a
    // MAGNITUDE outlier but stays monotone
    val spend = ((1 to 5).map(u => (u.toLong, "a", 10.0 * u)) ++
      (6 to 9).map(u => (u.toLong, "b", 10.0 * (u - 5))) :+
      (10L, "b", 1.0e6)).toDF("user_id", "segment", "spend")

    val streaks = Streaks.dailyStreaks(events, "user_id", "ts")
    assert(streaks.count() === 10)
    val labeled = streaks.join(spend, Seq("user_id"))
      .select(col("segment"), col("user_id"),
        col("longest_streak").cast("double").as("streak"), col("spend"))

    // rank layer: perfectly monotone in BOTH segments despite the
    // outlier's magnitude — tau-b is exactly 1 up to the sqrt ulp
    val tau = Robust.kendallByKey(labeled, "segment", "user_id",
        "streak", "spend")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(tau("a")._2 === 5L && tau("b")._2 === 5L)
    assert(math.abs(tau("a")._7.get - 1.0) < 1e-12)
    assert(math.abs(tau("b")._7.get - 1.0) < 1e-12)

    // trend layer: segment a is exactly spend = 10·streak; segment b's
    // outlier pair-slopes are a minority, so the median slope stays 10
    // (6 of 10 pairwise slopes are outlier-free)
    val slopes = Robust.theilSenByKey(labeled, "segment", "user_id",
        "streak", "spend")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(slopes("a")._4 === Some(10.0) && slopes("a")._5 === Some(0.0))
    assert(slopes("b")._4 === Some(10.0))

    // rerun determinism: the whole chain again, bit-identical
    val again = Robust.theilSenByKey(
      Streaks.dailyStreaks(events, "user_id", "ts")
        .join(spend, Seq("user_id"))
        .select(col("segment"), col("user_id"),
          col("longest_streak").cast("double").as("streak"), col("spend")),
      "segment", "user_id", "streak", "spend")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(again === slopes)
  }
}
