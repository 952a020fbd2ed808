package graft.sources

import graft.SparkSpec
import graft.sources.FixedWidth.Field
import org.apache.spark.sql.functions._

class FixedWidthSpec extends SparkSpec {
  import spark.implicits._

  private val layout = Seq(Field("id", 6, "bigint"),
    Field("name", 10), Field("bal", 12, "double"))

  test("formatLines renders exact character windows") {
    val df = Seq((7L, "alpha", 12.5)).toDF("id", "name", "bal")
    val line = FixedWidth.formatLines(df, layout).as[String].head()
    assert(line === "7     alpha     12.5        ")
    assert(line.length === 28)
  }

  test("roundtrip through a real text file is the identity") {
    val rows = Seq((1L, "a b", 10.25), (22L, "longername", -0.75),
      (333L, "x", 1234567.125))
    val df = rows.toDF("id", "name", "bal")
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_fixw_spec").getAbsolutePath
    FixedWidth.write(df, path, layout)
    val back = FixedWidth.read(spark, path, layout)
      .as[(Long, String, Double)].collect().toSet
    assert(back === rows.toSet)
  }

  test("nulls serialize as blank windows and read back as NULL") {
    val df = Seq((Some(1L), Option.empty[String], Some(2.5)),
      (None, Some("here"), None))
      .toDF("id", "name", "bal")
    val parsed = FixedWidth.parseLines(
      FixedWidth.formatLines(df, layout), "value", layout)
      .as[(Option[Long], Option[String], Option[Double])].collect().toSet
    assert(parsed === Set((Some(1L), None, Some(2.5)),
      (None, Some("here"), None)))
  }

  test("internal spaces survive; only the window pad is trimmed") {
    val df = Seq((1L, "a  b", 0.0)).toDF("id", "name", "bal")
    val parsed = FixedWidth.parseLines(
      FixedWidth.formatLines(df, layout), "value", layout)
      .select("name").as[String].head()
    assert(parsed === "a  b")
  }

  test("leading spaces are data and round-trip; only the pad is cut") {
    // the writer right-pads, so the read must rtrim — a trim would eat
    // the leading spaces of "  lead" (ADVICE r11)
    val df = Seq((1L, "  lead", 0.0)).toDF("id", "name", "bal")
    val parsed = FixedWidth.parseLines(
      FixedWidth.formatLines(df, layout), "value", layout)
      .select("name").as[String].head()
    assert(parsed === "  lead")
  }

  test("a value longer than its window raises instead of corrupting") {
    val df = Seq((1L, "elevenchars", 0.0)).toDF("id", "name", "bal")
    val e = intercept[Exception] {
      FixedWidth.formatLines(df, layout).collect()
    }
    assert(e.getMessage.contains("fixed-width overflow") ||
      Option(e.getCause).exists(_.getMessage.contains("fixed-width")))
  }

  test("short records read as NULL-padded tails, not errors") {
    val df = Seq("5     onlytwo").toDF("line")
    val parsed = FixedWidth.parseLines(df, "line", layout)
      .as[(Option[Long], Option[String], Option[Double])].head()
    assert(parsed === ((Some(5L), Some("onlytwo"), None)))
  }

  test("a window that fails its cast lands NULL (ANSI-off contract)") {
    val df = Seq("abc   x         notanumber  ").toDF("line")
    val parsed = FixedWidth.parseLines(df, "line", layout)
      .as[(Option[Long], Option[String], Option[Double])].head()
    assert(parsed === ((None, Some("x"), None)))
  }

  test("parse is a pure projection: no shuffle, no UDF in the plan") {
    val df = Seq("1     n         2.0         ").toDF("line")
    val p = FixedWidth.parseLines(df, "line", layout)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("BatchEvalPython"))
  }
}
