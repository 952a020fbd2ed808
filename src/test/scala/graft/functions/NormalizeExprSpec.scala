package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}

/** UAX#15 normalization vectors (unicode.org/reports/tr15) pinned for
  * every form. NFC is additionally oracle-checked end-to-end by
  * q_unicode_nfc (DuckDB nfc_normalize); the compatibility forms have no
  * DuckDB counterpart, so their behavior is pinned here.
  *
  * All codepoints are written as \\u escapes — literal composed /
  * decomposed characters in source are indistinguishable to a reader
  * and at the mercy of editor renormalization. */
class NormalizeExprSpec extends SparkSpec {
  import spark.implicits._

  private val eAcuteC = "\u00e9"       // é composed
  private val eAcuteD = "e\u0301"      // e + combining acute
  private val nTildeC = "\u00f1"       // ñ composed
  private val nTildeD = "n\u0303"      // n + combining tilde
  private val fiLig = "\ufb01"         // fi ligature
  private val fwAB = "\uff21\uff22"    // fullwidth A, B
  private val sup2 = "\u00b2"          // superscript two

  private def norm(s: String, form: String): String =
    Seq(s).toDF("s")
      .select(NormalizeExpr.unicode_normalize(col("s"), form))
      .as[String].head()

  test("NFC composes combining sequences") {
    assert(norm(eAcuteD, "NFC") === eAcuteC)
    assert(norm(nTildeD, "NFC") === nTildeC)
    assert(norm("already ascii", "NFC") === "already ascii")
  }

  test("NFD decomposes precomposed characters") {
    assert(norm(eAcuteC, "NFD") === eAcuteD)
    assert(norm(nTildeC, "NFD") === nTildeD)
  }

  test("NFKC folds compatibility variants (ligature, fullwidth, superscript)") {
    assert(norm(fiLig + "le", "NFKC") === "file")
    assert(norm(fwAB, "NFKC") === "AB")
    assert(norm("x" + sup2, "NFKC") === "x2")
    // canonical composition still applies under NFKC
    assert(norm(eAcuteD, "NFKC") === eAcuteC)
  }

  test("NFKD decomposes compatibility variants without recomposing") {
    assert(norm(fiLig, "NFKD") === "fi")
    assert(norm(eAcuteC, "NFKD") === eAcuteD)
  }

  test("null propagates; bad form fails") {
    val out = Seq(Option.empty[String]).toDF("s")
      .select(NormalizeExpr.unicode_normalize(col("s"), "NFC"))
      .collect()
    assert(out.head.isNullAt(0))
    val err = intercept[Exception] {
      Seq("x").toDF("s")
        .select(NormalizeExpr.unicode_normalize(col("s"), "NFX"))
        .collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (t.getMessage != null && t.getMessage.contains("NFX") ||
        mentions(t.getCause))
    assert(mentions(err))
  }

  test("registered SQL function evaluates (GraftExtensions)") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      s"SELECT unicode_normalize('$eAcuteD', 'NFC') AS s").as[String].head()
    assert(out === eAcuteC)
  }

  test("interpreted eval matches the dataframe (codegen) path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val in = fiLig + " " + eAcuteD
    val e = UnicodeNormalize(
      Literal(UTF8String.fromString(in),
        org.apache.spark.sql.types.StringType), "NFKC")
    assert(e.eval(null).toString === "fi " + eAcuteC)
    assert(norm(in, "NFKC") === "fi " + eAcuteC)
  }
}
