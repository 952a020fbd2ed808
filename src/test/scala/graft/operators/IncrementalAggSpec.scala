package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")

  private def fixture: DataFrame = Seq(
    ("a", Some(1.5)), ("a", Some(2.5)), ("a", None),
    ("b", Some(-3.0)), ("b", Some(10.0)),
    ("c", None), // key with ONLY null values
    ("d", Some(0.0))
  ).toDF("k", "v")

  private def finals(df: DataFrame): Map[String, (Long, Long,
      Option[Double], Option[Double], Option[Double], Option[Double])] =
    df.as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap

  private def direct(df: DataFrame): DataFrame =
    IncrementalAgg.finalize(
      IncrementalAgg.state(df, keys, "v"), keys)

  test("merged batch states equal the one-shot aggregation") {
    val all = fixture
    val batches = Seq(
      all.filter($"v".isNull || $"v" > 0),
      all.filter($"v".isNotNull && $"v" <= 0))
    val merged = IncrementalAgg.finalize(
      IncrementalAgg.merge(batches.map(IncrementalAgg.state(_, keys, "v")),
        keys), keys)
    assert(finals(merged) == finals(direct(all)))
  }

  test("merge is associative and commutative") {
    val parts = Seq(
      Seq(("a", Some(1.0)), ("b", Some(2.0))),
      Seq(("a", Some(3.0)), ("c", None)),
      Seq(("b", Some(-1.0)), ("a", None)))
      .map(_.toDF("k", "v")).map(IncrementalAgg.state(_, keys, "v"))
    val Seq(s1, s2, s3) = parts
    val left = IncrementalAgg.merge(
      Seq(IncrementalAgg.merge(Seq(s1, s2), keys), s3), keys)
    val right = IncrementalAgg.merge(
      Seq(s1, IncrementalAgg.merge(Seq(s2, s3), keys)), keys)
    val swapped = IncrementalAgg.merge(Seq(s3, s1, s2), keys)
    val l = finals(IncrementalAgg.finalize(left, keys))
    assert(l == finals(IncrementalAgg.finalize(right, keys)))
    assert(l == finals(IncrementalAgg.finalize(swapped, keys)))
  }

  test("a key present in only one batch passes through unchanged") {
    val only = Seq(("z", Some(7.25))).toDF("k", "v")
    val other = Seq(("a", Some(1.0))).toDF("k", "v")
    val merged = IncrementalAgg.finalize(
      IncrementalAgg.merge(
        Seq(IncrementalAgg.state(only, keys, "v"),
          IncrementalAgg.state(other, keys, "v")), keys), keys)
    assert(finals(merged)("z") ==
      ((1L, 1L, Some(7.25), Some(7.25), Some(7.25), Some(7.25))))
  }

  test("all-null keys carry row counts but NULL statistics") {
    val got = finals(direct(fixture))("c")
    assert(got == ((1L, 0L, None, None, None, None)))
  }

  test("many random splits all fold to the same finals") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type").as("k"), col("value").as("v"))
    val expected = finals(direct(ev))
    Seq(2, 5).foreach { nSplits =>
      val states = (0 until nSplits).map(i =>
        IncrementalAgg.state(
          ev.filter(pmod(xxhash64(col("k"), col("v")), lit(nSplits)) === i),
          keys, "v"))
      val merged = IncrementalAgg.finalize(
        IncrementalAgg.merge(states, keys), keys)
      assert(finals(merged) == expected, s"nSplits=$nSplits diverged")
    }
  }
}
