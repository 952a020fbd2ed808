package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class DateFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-02-15 13:45:30.123")

  test("last-day family (date.py:111-122)") {
    val row = Seq(ts).toDF("t").select(
      DateFunctions.lastDayOfMonth(col("t")).cast("string"),
      DateFunctions.lastDayOfLastMonth(col("t")).cast("string"))
      .as[(String, String)].collect().head
    assert(row == ("2024-02-29", "2024-01-31")) // leap year covered
  }

  test("strftime renders (date.py:127-261)") {
    val row = Seq(ts).toDF("t").select(
      DateFunctions.formatYm(col("t")), DateFunctions.formatYmd(col("t")),
      DateFunctions.formatBr(col("t")))
      .as[(String, String, String)].collect().head
    assert(row == ("202402", "20240215", "15/02/2024"))
  }

  test("watermark literal: ms-truncated datetime vs plain date (fast_etl.py:415-422)") {
    val row = Seq(ts).toDF("t").select(
      DateFunctions.watermarkLiteral(col("t"), isDate = false),
      DateFunctions.watermarkLiteral(col("t"), isDate = true))
      .as[(String, String)].collect().head
    assert(row == ("2024-02-15 13:45:30.123", "2024-02-15"))
  }

  test("ISO parse round trip (string_formatting.py:30-42)") {
    val back = Seq("2024-02-15T13:45:30.123Z").toDF("s")
      .select(DateFunctions.parseIso(col("s"))).as[Timestamp].collect().head
    assert(back == ts)
  }
}
