package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImputationSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clips below lo and above hi, keeps the middle") {
    // key a: values 1..20; p05 -> rank ceil(.05*20)=1 -> 1.0;
    // p95 -> rank 19 -> 19.0. So 20 clips to 19, nothing clips low
    // (lo = min). With p10: rank 2 -> 2.0, so 1 clips up to 2.
    val df = (1 to 20).map(i => ("a", i.toLong, i.toDouble))
      .toDF("k", "id", "v")
    val out = Imputation.winsorize(df, "k", "v", "id", 0.10, 0.95)
      .select("id", "v_w").as[(Long, Double)].collect().toMap
    assert(out(1L) == 2.0)   // clipped up to p10
    assert(out(2L) == 2.0)
    assert(out(10L) == 10.0) // untouched
    assert(out(19L) == 19.0)
    assert(out(20L) == 19.0) // clipped down to p95
  }

  test("winsorize bounds are per key") {
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 10).map(i => ("b", i.toLong, i * 100.0))).toDF("k", "id", "v")
    val out = Imputation.winsorize(df, "k", "v", "id", 0.2, 0.8)
      .select("k", "id", "v_w").as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", 1L)) == 2.0 && out(("a", 10L)) == 8.0)
    assert(out(("b", 1L)) == 200.0 && out(("b", 10L)) == 800.0)
  }

  test("winsorize keeps nulls null and out of the quantile ranks") {
    // Without explicit handling, Spark's nulls-first sort puts the null
    // at rank 1 (shifting both bounds) and least/greatest SKIP nulls,
    // fabricating the upper bound for the null row.
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)),
      ("a", 3L, Some(30.0)), ("a", 4L, Some(40.0)),
      ("a", 5L, Option.empty[Double])
    ).toDF("k", "id", "v")
    val out = Imputation.winsorize(df, "k", "v", "id", 0.25, 0.75)
      .select("id", "v_w").as[(Long, Option[Double])].collect().toMap
    assert(out(5L).isEmpty) // null stays null
    // bounds from the 4 non-null rows: p25 -> rank 1 -> 10, p75 -> rank 3 -> 30
    assert(out(1L).contains(10.0))
    assert(out(4L).contains(30.0))
  }

  test("imputeMode fills nulls with the group mode, ties to smallest") {
    val df = Seq(
      (1L, Some("x")), (1L, Some("x")), (1L, Some("y")), (1L, None),
      (2L, Some("p")), (2L, Some("q")), (2L, None), // tie -> 'p'
      (3L, None) // all-null group stays null
    ).toDF("k", "v")
    val out = Imputation.imputeMode(df, "k", "v")
      .as[(Long, Option[String])].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(out(1L).count(_.contains("x")) == 3) // two originals + fill
    assert(out(2L).flatten.sorted == Seq("p", "p", "q"))
    assert(out(3L) == Seq(None))
  }

  test("imputeMode leaves non-null values untouched") {
    val df = Seq((1L, Some("a")), (1L, Some("b")), (1L, Some("b")))
      .toDF("k", "v")
    val out = Imputation.imputeMode(df, "k", "v")
      .as[(Long, Option[String])].collect().map(_._2).toSeq
    assert(out.flatten.sorted == Seq("a", "b", "b"))
  }
}
