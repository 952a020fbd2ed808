package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Edge cases from the reference's CPF rules (patchwork.py:607-726,
  * _validate_digits :611-621; FIXTURES.md A3). */
class CpfFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOf(values: String*): Seq[Option[String]] =
    values.toDF("cpf")
      .select(CpfFunctions.cpfClean(col("cpf")).as("c"))
      .collect().toIndexedSeq.map(r => Option(r.getString(0)))

  test("valid CPF with separators is normalized to digits") {
    assert(cleanOf("529.982.247-25") == Seq(Some("52998224725")))
  }

  test("valid bare CPF passes unchanged") {
    assert(cleanOf("52998224725") == Seq(Some("52998224725")))
  }

  test("wrong check digit is rejected") {
    assert(cleanOf("52998224726") == Seq(None))
  }

  test("all-same-digit sequences are rejected even with valid-looking checksums") {
    assert(cleanOf("00000000000", "11111111111", "111.111.111-11") ==
      Seq(None, None, None))
  }

  test("short values are left-padded to 11 before the checksum") {
    // 02998224725: padded form of 2998224725; checksum decides validity.
    val padded = cleanOf("2998224725")
    assert(padded.head.forall(_.length == 11))
  }

  test("garbage characters are rejected") {
    assert(cleanOf("ab529982247", "529x982!247", "") == Seq(None, None, None))
  }

  test("known-valid CPFs pass (check digits computed externally)") {
    // 111.444.777-35 is the canonical textbook-valid CPF.
    assert(cleanOf("111.444.777-35") == Seq(Some("11144477735")))
  }

  test("cpfFormat masks 11 digits, rejects everything else") {
    val df = Seq(Some("52998224725"), Some("5299822472"), Some("abc"),
      None).toDF("c")
    val out = df.select(CpfFunctions.cpfFormat(col("c")).as("f"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("529.982.247-25"), None, None, None))
  }
}
