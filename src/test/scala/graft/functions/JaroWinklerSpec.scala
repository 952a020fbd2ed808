package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(JaroWinklerExpr.jaro_winkler(col("a"), col("b")))
      .as[Double].head()

  test("matches the published values bit-for-bit (DuckDB-verified)") {
    // expected doubles are DuckDB jaro_winkler_similarity outputs,
    // captured verbatim — the contract is BIT equality, which is what
    // lets the oracle compare raw doubles with no rounding waypoint
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("abcd", "badc", 0.8333333333333334),
      ("ab", "ba", 0.0), // jaro below the 0.7 boost threshold stays raw
      ("Customer#000000001", "Customer#000000011", 0.9777777777777777),
      ("same", "same", 1.0),
      ("a", "a", 1.0),
      ("abc", "xyz", 0.0),
      ("prefix", "prefax", 0.9333333333333333))
    cases.foreach { case (a, b, expected) =>
      assert(jw(a, b) == expected, s"jw($a, $b)")
      assert(jw(b, a) == expected, s"jw($b, $a) (symmetry)")
    }
  }

  test("empty and NULL semantics") {
    assert(jw("", "") == 0.0) // DuckDB: both-empty is 0.0, not 1.0
    assert(jw("a", "") == 0.0)
    val n = Seq(("abc", null.asInstanceOf[String])).toDF("a", "b")
      .select(JaroWinklerExpr.jaro_winkler(col("a"), col("b")))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("byte-oriented: multi-byte codepoints count per byte") {
    // 'é' is 2 UTF-8 bytes; byte-view windows find no match (a
    // codepoint view would score 'éa'/'ea' as 2/3-similar)
    assert(jw("éa", "ea") == 0.0)
  }

  test("SQL registry exposes jaro_winkler") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta')").as[Double].head()
    assert(got == 0.9611111111111111)
  }

  test("whole-stage codegen and interpreted eval agree") {
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("", "x"), ("abab", "baba")).toDF("a", "b")
    val viaCodegen = pairs
      .select(JaroWinklerExpr.jaro_winkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    val viaEval = pairs.collect().map { r =>
      JaroWinklerExpr.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
    }.toSeq
    assert(viaCodegen == viaEval)
  }
}
