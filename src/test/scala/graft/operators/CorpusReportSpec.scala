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
