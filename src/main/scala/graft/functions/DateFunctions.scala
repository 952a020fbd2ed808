package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-date helpers — utils/date.py re-expressed as Column
  * expressions (the Jinja-template strftime renders of date.py:127-261
  * become date_format patterns; the run-date resolution of date.py:16-109
  * is driver-side job-parameter logic, out of the data path).
  */
object DateFunctions {

  /** last_day_of_month (date.py:111-116). */
  def lastDayOfMonth(c: Column): Column = last_day(c)

  /** last_day_of_last_month (date.py:118-122). */
  def lastDayOfLastMonth(c: Column): Column = last_day(add_months(c, -1))

  /** The strftime renders the reference templates expose
    * (%Y%m, %Y%m%d, %d/%m/%Y — date.py:127-261). */
  def formatYm(c: Column): Column = date_format(c, "yyyyMM")
  def formatYmd(c: Column): Column = date_format(c, "yyyyMMdd")
  def formatBr(c: Column): Column = date_format(c, "dd/MM/yyyy")

  /** GSheets ISO-string parse (string_formatting.py:30-42). */
  def parseIso(c: Column): Column =
    to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  /** Watermark rendering: date vs datetime discrimination with
    * millisecond truncation (fast_etl.py:415-422) — datetimes render with
    * ms precision, dates as plain yyyy-MM-dd. */
  def watermarkLiteral(c: Column, isDate: Boolean): Column =
    if (isDate) date_format(c, "yyyy-MM-dd")
    else date_format(c, "yyyy-MM-dd HH:mm:ss.SSS")
}
