package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  test("keySkewReport: counts, shares and globals (string keys)") {
    // untied counts so the hash-surrogate tiebreak never decides order
    val rows = Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold")
    val df = rows.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "k")
    val rep = Skew.keySkewReport(df, "k", 2)
      .orderBy("rank")
      .select("rank", "k", "cnt", "share", "total_rows", "n_keys")
      .as[(Int, String, Long, Double, Long, Long)].collect().toSeq
    assert(rep == Seq(
      (1, "hot", 6L, 0.6, 10L, 3L),
      (2, "warm", 3L, 0.3, 10L, 3L)))
  }

  test("keySkewReport: integral keys tie-break ascending (oracle rule)") {
    val df = Seq(5L, 5L, 9L, 9L, 2L).map(k => (k, 1)).toDF("k", "v")
    val rep = Skew.keySkewReport(df, "k", 3)
      .orderBy("rank").select("rank", "k", "cnt")
      .as[(Int, Long, Long)].collect().toSeq
    // counts: 5->2, 9->2, 2->1; tie between 5 and 9 breaks on key asc
    assert(rep == Seq((1, 5L, 2L), (2, 9L, 2L), (3, 2L, 1L)))
  }
}
