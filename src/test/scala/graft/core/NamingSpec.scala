package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class NamingSpec extends SparkSpec {
  import spark.implicits._

  test("slugify: unaccent, lowercase, underscores (string_formatting.py:13-28)") {
    assert(Naming.slugify("Órgão Superior") == "orgao_superior")
    assert(Naming.slugify("  Data de Início ") == "data_de_inicio")
    assert(Naming.slugify("Valor (R$)") == "valor_r")
    assert(Naming.slugify("já_ok_123") == "ja_ok_123")
  }

  test("slugifyColumns renames all headers") {
    val df = Seq((1, 2)).toDF("Órgão", "Valor Total")
    assert(Naming.slugifyColumns(df).columns.toSeq == Seq("orgao", "valor_total"))
  }

  test("htmlEncode replaces accented letters with entities (encode_html.py)") {
    import graft.functions.StringUtils
    assert(StringUtils.htmlEncode("relatório até ação") ==
      "relat&oacute;rio at&eacute; a&ccedil;&atilde;o")
    assert(StringUtils.htmlEncode("plain text") == "plain text")
  }

  test("vocativeNames joins first names with ' e ' tail (string_formatting.py:44-63)") {
    import graft.functions.StringUtils
    assert(StringUtils.vocativeNames(Seq("fulano.silva@x.org")) == "Fulano")
    assert(StringUtils.vocativeNames(
      Seq("fulano.a@x", "sicrano.b@x", "beltrano.c@x")) ==
      "Fulano, Sicrano e Beltrano")
  }

  test("resolveProjection is case-insensitive, ordered by dest, skips missing") {
    val df = Seq((1L, "x", 2.0)).toDF("Id", "Name", "Weight")
    val cols = Naming.resolveProjection(df,
      Seq("name", "ID", "missing_col", "weight"), Seq("WEIGHT"))
    val out = df.select(cols: _*)
    assert(out.columns.toSeq == Seq("name", "ID"))
  }
}
