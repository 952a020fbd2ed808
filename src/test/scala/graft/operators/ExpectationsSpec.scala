package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private def report(df: org.apache.spark.sql.DataFrame, checks: Seq[Check]) =
    Expectations.run(df, checks).select("check", "violations", "total", "passed")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("row-level checks count violations in one pass") {
    val df = Seq(
      (1L, Some("alice"), Some(10.0), "A"),
      (2L, None, Some(500.0), "B"),
      (3L, Some("bob"), Some(-3.0), "C"),
      (4L, Some("carol!"), None, "A"))
      .toDF("id", "name", "bal", "seg")
    val r = report(df, Seq(
      NotNull("name"),
      InRange("bal", lit(0.0), lit(100.0)),
      AcceptedValues("seg", Seq("A", "B")),
      Matches("name", "^[a-z]+$")))
    assert(r("not_null:name") == ((1L, 4L, false)))
    // 500 above hi, -3 below lo; the NULL bal is not a range violation
    assert(r("in_range:bal") == ((2L, 4L, false)))
    assert(r("accepted_values:seg") == ((1L, 4L, false)))
    // NULL name is not a match violation; "carol!" is
    assert(r("matches:name") == ((1L, 4L, false)))
  }

  test("unique counts surplus duplicate rows, ignoring null keys") {
    val df = Seq(
      (Some(1L), "x"), (Some(1L), "y"), (Some(1L), "z"),
      (Some(2L), "x"), (None, "x"), (None, "y"))
      .toDF("k", "v")
    val r = report(df, Seq(Unique(Seq("k"))))
    // three 1s -> 2 surplus; nulls excluded entirely (dbt semantics)
    assert(r("unique:k") == ((2L, 6L, false)))
  }

  test("composite unique treats the tuple as the key") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "a"), (2L, "a"))
      .toDF("k1", "k2")
    val r = report(df, Seq(Unique(Seq("k1", "k2"))))
    assert(r("unique:k1,k2") == ((1L, 4L, false)))
  }

  test("a clean table passes every check") {
    val df = Seq((1L, "aa", 5.0, "A"), (2L, "bb", 7.5, "B"))
      .toDF("id", "name", "bal", "seg")
    val r = report(df, Seq(
      NotNull("name"), Unique(Seq("id")),
      InRange("bal", lit(0.0), lit(10.0)),
      AcceptedValues("seg", Seq("A", "B")), Matches("name", "^[a-z]+$")))
    assert(r.values.forall { case (v, n, p) => v == 0L && n == 2L && p })
  }

  test("foreignKey counts orphans; null FKs are not orphans") {
    val fact = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(99L)),
      (4L, None)).toDF("id", "fk")
    val dim = Seq(10L, 20L, 20L).toDF("pk")
    val row = foreignKey(fact, "fk", dim, "pk")
      .as[(String, Long, Long, Boolean)].collect().head
    assert(row == (("foreign_key:fk", 1L, 4L, false)))
  }

  test("duplicate check names are rejected") {
    val df = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Expectations.run(df, Seq(NotNull("name"), NotNull("name")))
    }
  }

  test("quarantine tags failing rows in suite order, clean rows NULL") {
    val df = Seq(
      (1L, Some("ok"), Some(5.0)),
      (2L, None, Some(500.0)),
      (3L, Some("BAD!"), Some(5.0)),
      (4L, Some("ok"), Some(5.0)))
      .toDF("id", "name", "bal")
    val out = Expectations.quarantine(df, Seq(
      NotNull("name"),
      InRange("bal", lit(0.0), lit(100.0)),
      Matches("name", "^[a-z]+$")))
      .select("id", "reasons").as[(Long, Option[String])].collect().toMap
    assert(out(1L).isEmpty && out(4L).isEmpty)
    assert(out(2L).contains("not_null:name,in_range:bal"))
    assert(out(3L).contains("matches:name"))
  }

  test("quarantine rejects aggregate-level checks") {
    val df = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Expectations.quarantine(df, Seq(Unique(Seq("id"))))
    }
  }

  test("quarantine agrees with run's violation counts") {
    val df = Seq(
      (1L, Some("aa"), Some(5.0)), (2L, None, Some(-1.0)),
      (3L, Some("zz"), None), (4L, Some("!!"), Some(200.0)))
      .toDF("id", "name", "bal")
    val checks = Seq(NotNull("name"), InRange("bal", lit(0.0), lit(100.0)),
      Matches("name", "^[a-z]+$"))
    val tagged = Expectations.quarantine(df, checks)
    val perCheck = checks.map { c =>
      c.name -> tagged.filter(col("reasons").isNotNull &&
        col("reasons").contains(c.name)).count()
    }.toMap
    val suite = report(df, checks)
    assert(perCheck == suite.view.mapValues(_._1).toMap)
  }
}
