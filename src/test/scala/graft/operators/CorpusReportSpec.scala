package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CorpusReport — histogram binning edges/clamping and the per-stratum
  * report's exact aggregation. */
class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  test("scoreHistogram bins with clamping and drops NULLs") {
    val d = Seq(Some(0.0), Some(0.04), Some(0.05), Some(0.97), Some(1.0),
      Some(1.5), Some(-0.2), None)
      .toDF("s")
    val h = CorpusReport.scoreHistogram(d, col("s"), bins = 20)
      .orderBy("bin").select($"bin", $"n").as[(Long, Long)].collect().toSeq
    // bin 0: 0.0, 0.04, and the clamped -0.2; bin 1: 0.05 (left-closed
    // edge); bin 19: 0.97, plus clamped 1.0 and 1.5; NULL dropped
    assert(h == Seq((0L, 3L), (1L, 1L), (19L, 3L)))
  }

  test("scoreHistogram counts sum to the non-null corpus") {
    val d = (1 to 97).map(i => i / 97.0).toDF("s")
    val total = CorpusReport.scoreHistogram(d, col("s"), bins = 7)
      .agg(sum($"n")).as[Long].head()
    assert(total == 97)
  }

  test("scoreHistogram lo_edge reflects custom ranges") {
    val d = Seq(12.0, 14.9, 25.0).toDF("s")
    val h = CorpusReport.scoreHistogram(d, col("s"), bins = 4,
        lo = 10.0, hi = 30.0)
      .orderBy("bin").select($"bin", $"lo_edge", $"n")
      .as[(Long, Double, Long)].collect().toSeq
    assert(h == Seq((0L, 10.0, 2L), (3L, 25.0, 1L)))
  }

  test("scoreHistogram drops NaN scores instead of binning them low") {
    val d = Seq(Double.NaN, 0.5).toDF("s")
    val h = CorpusReport.scoreHistogram(d, col("s"), bins = 20)
      .select($"bin", $"n").as[(Long, Long)].collect().toSeq
    assert(h == Seq((10L, 1L)))
  }

  test("strataReport's mean divides by scored docs, not all docs") {
    val d = Seq(
      ("en", Option("the quick brown fox")),
      ("en", Option.empty[String]),
      ("en", Option("the quick brown fox"))
    ).toDF("lang", "text")
    val r = CorpusReport.strataReport(d, "lang", "text")
      .select($"n_docs", $"avg_quality").as[(Long, Double)].head()
    // NULL-text doc counts as a document but not against the mean
    val one = CorpusReport.strataReport(
        Seq(("en", "the quick brown fox")).toDF("lang", "text"),
        "lang", "text")
      .select($"avg_quality").as[Double].head()
    assert(r._1 == 3 && r._2 == one)
  }

  test("percentileRank normalizes per stratum with shared tie ranks") {
    val d = Seq(
      ("en", 1L, 0.2), ("en", 2L, 0.5), ("en", 3L, 0.5), ("en", 4L, 0.9),
      ("zh", 5L, 7.0) // singleton stratum, incomparable scale
    ).toDF("lang", "id", "score")
    val r = CorpusReport.percentileRank(d, col("score"), Seq("lang"))
      .select($"id", $"pct").as[(Long, Double)].collect().toMap
    // en ranks asc: 0.2 -> 1, 0.5 -> 2 (tie), 0.9 -> 4; n = 4
    assert(r(1L) == 0.0)
    assert(r(2L) == 1.0 / 3.0 && r(3L) == 1.0 / 3.0)
    assert(r(4L) == 1.0)
    assert(r(5L) == 0.0) // singleton
  }

  test("percentileRank drops NULL scores instead of ranking them") {
    val d = Seq(("en", 1L, Option(0.5)), ("en", 2L, Option.empty[Double]))
      .toDF("lang", "id", "score")
    val r = CorpusReport.percentileRank(d, col("score"), Seq("lang"))
      .select($"id", $"pct").as[(Long, Double)].collect().toSeq
    assert(r == Seq((1L, 0.0)))
  }

  test("strataReport aggregates exactly per stratum") {
    val d = Seq(
      ("en", "the quick brown fox"),
      ("en", "a lazy dog sits"),
      ("de", "der hund")
    ).toDF("lang", "text")
    val r = CorpusReport.strataReport(d, "lang", "text")
      .orderBy("lang")
      .select($"lang", $"n_docs", $"sum_tokens")
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("de", 1L, 2L), ("en", 2L, 8L)))
  }
}
