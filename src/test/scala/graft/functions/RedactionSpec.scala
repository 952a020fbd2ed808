package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedactionSpec extends SparkSpec {

  private def redact(s: String): (String, Int, Int, Int) = {
    import spark.implicits._
    val r = Seq(s).toDF("t").select(
      Redaction.redactAll(col("t")).as("r"),
      Redaction.countMatches(col("t"), Redaction.EmailPattern).as("e"),
      Redaction.countMatches(col("t"), Redaction.PhonePattern).as("p"),
      Redaction.countMatches(col("t"), Redaction.CpfPattern).as("c"))
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  test("emails are replaced and counted") {
    val (r, e, _, _) = redact("mail me at a.b+tag@sub.example.org today")
    assert(r == "mail me at <EMAIL> today")
    assert(e == 1)
  }

  test("phones and CPFs are replaced") {
    val (r, _, p, c) = redact("call +55 11 98765-4321 doc 123.456.789-09 ok")
    assert(r == "call <PHONE> doc <CPF> ok")
    assert(p == 1 && c == 1)
  }

  test("plain digit runs and bare at-signs survive") {
    val (r, e, p, c) = redact("order 12345678901 at @handle price 1.234.56")
    assert(r == "order 12345678901 at @handle price 1.234.56")
    assert(e == 0 && p == 0 && c == 0)
  }

  test("multiple occurrences all redact") {
    val (r, e, _, _) = redact("x@y.co and z@w.io")
    assert(r == "<EMAIL> and <EMAIL>")
    assert(e == 2)
  }
}
