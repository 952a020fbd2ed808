package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompressRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: Seq[String]) =
    texts.toDF("t")
      .select(CompressRatioExpr.compress_ratio(col("t")))
      .as[Double].collect()

  test("repetition compresses below prose, noise above it") {
    val boiler = "click here to subscribe " * 80
    val prose = "The quick brown fox jumps over the lazy dog and then " +
      "wanders across a wide field looking for something new to chase, " +
      "pausing often to sniff the cold morning air near the river bank." * 6
    val noise = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).alphanumeric.take(1500).mkString
    val Seq(rb, rp, rn) = ratios(Seq(boiler, prose, noise)).toSeq
    assert(rb < rp && rp < rn, s"boiler=$rb prose=$rp noise=$rn")
    assert(rb < 0.15, s"heavy repetition must compress hard: $rb")
  }

  test("empty is 1.0, null propagates, determinism holds") {
    val df = Seq(Some(""), None, Some("abcabcabc")).toDF("t")
      .select(CompressRatioExpr.compress_ratio(col("t")).as("r"))
    val out = df.as[Option[Double]].collect()
    assert(out(0).contains(1.0))
    assert(out(1).isEmpty)
    assert(ratios(Seq("abcabcabc")).head == out(2).get)
  }

  test("interpreted eval matches codegen") {
    val s = "some moderately repetitive text, repetitive text indeed"
    val viaDf = ratios(Seq(s)).head
    val viaEval = CompressRatioExpr.ratio(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(viaDf == viaEval)
  }

  test("registered in the SQL function registry") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT compress_ratio('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS r")
      .as[Double].collect().head
    assert(r < 0.5)
  }
}
