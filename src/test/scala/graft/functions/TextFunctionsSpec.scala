package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("tokenCount handles empty, single, multi-space, padded strings") {
    val rows = Seq("", "   ", "one", "one two", "  a   b   c  ", "a\tb\nc")
      .toDF("t").select(TextFunctions.tokenCount(col("t")).as("n"))
      .as[Int].collect().toSeq
    assert(rows == Seq(0, 0, 1, 2, 3, 3))
  }

  test("normalize collapses whitespace and lowercases") {
    val n = Seq("  Hello   WORLD  ").toDF("t")
      .select(TextFunctions.normalize(col("t")).as("n")).as[String]
      .collect().head
    assert(n == "hello world")
  }

  test("occurrences counts non-overlapping padded matches") {
    val df = Seq("the cat the dog the end").toDF("t")
    assert(one[Double](df.select(TextFunctions.occurrences(col("t"), " the "))) == 3.0)
    assert(one[Double](df.select(TextFunctions.occurrences(col("t"), " missing "))) == 0.0)
  }

  test("langId picks the marker-dominant language, und when none") {
    val rows = Seq(
      "the quick fox and the dog near the tree",
      "el gato y el perro en la casa de la playa",
      "nothing matches here at all")
      .toDF("t").select(TextFunctions.langId(col("t")).as("l"))
      .as[String].collect().toSeq
    assert(rows == Seq("en", "es", "und"))
  }

  test("punctRatio counts punctuation share; zero for empty") {
    val df = Seq("ab,c!", "").toDF("t")
      .select(TextFunctions.punctRatio(col("t")).as("r")).as[Double]
      .collect().toSeq
    assert(df == Seq(2.0 / 5.0, 0.0))
  }

  test("quality score is bounded in [0,1]") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bounds = docs
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .agg(org.apache.spark.sql.functions.min("q"),
        org.apache.spark.sql.functions.max("q"))
      .collect().head
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
  }

  test("word shingles: short docs yield empty, order preserved") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(org.apache.spark.sql.functions.split(
        TextFunctions.collapseWs(col("t")), " ").as("ws"))
      .select(TextFunctions.wordShingles("ws", 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    assert(df.head == Seq("a b c", "b c d"))
    assert(df(1).isEmpty)
  }

  test("foldAccents maps the full Latin-1/PT table, passes others through") {
    val df = Seq("São Paulo", "açaí ÉPÜ", "plain ascii 123", "日本語")
      .toDF("s")
    val out = df.select(TextFunctions.foldAccents(col("s")).as("f"))
      .as[String].collect().toSeq
    assert(out == Seq("Sao Paulo", "acai EPU", "plain ascii 123", "日本語"))
    assert(TextFunctions.AccentedChars.length ==
      TextFunctions.FoldedChars.length)
  }
}
