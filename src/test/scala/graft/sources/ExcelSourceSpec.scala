package graft.sources

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._

import graft.SparkSpec

/** ExcelSource against a hand-written ECMA-376 workbook (not produced by
  * any code under test): shared strings, inline strings, numbers, bools,
  * date-styled serials, sparse cells, multi-row headers. Mirrors the
  * reference's pd.read_excel surface (samba_services.py:142-161). */
class ExcelSourceSpec extends SparkSpec {

  /** Zip the given (entryName -> xml) pairs into a temp .xlsx. */
  private def makeXlsx(entries: (String, String)*): String = {
    val f = Files.createTempFile("graft_excel", ".xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(f))
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    f.toFile.deleteOnExit()
    f.toString
  }

  private val relsXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |  <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
      |  <Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
      |</Relationships>""".stripMargin

  private val workbookXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
      |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |  <sheets>
      |    <sheet name="Relatório Geral" sheetId="1" r:id="rId1"/>
      |    <sheet name="Extras" sheetId="2" r:id="rId2"/>
      |  </sheets>
      |</workbook>""".stripMargin

  // shared strings with a rich-text run (split <t> inside one <si>)
  private val sharedXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
      |  <si><t>Código IBGE</t></si>
      |  <si><t>Nome do Município</t></si>
      |  <si><r><t>São </t></r><r><t>Paulo</t></r></si>
      |  <si><t>Data de Criação</t></si>
      |  <si><t>Ativo</t></si>
      |</sst>""".stripMargin

  // style 0: General; style 1: built-in date (numFmtId 14); style 2:
  // custom date; style 3: custom non-date (quoted "dia" must not trip it)
  private val stylesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |  <numFmts count="2">
      |    <numFmt numFmtId="164" formatCode="dd/mm/yyyy hh:mm"/>
      |    <numFmt numFmtId="165" formatCode="&quot;dias:&quot; 0.00"/>
      |  </numFmts>
      |  <cellXfs count="4">
      |    <xf numFmtId="0"/>
      |    <xf numFmtId="14"/>
      |    <xf numFmtId="164"/>
      |    <xf numFmtId="165"/>
      |  </cellXfs>
      |</styleSheet>""".stripMargin

  // sheet1: header row + 3 data rows; B3 blank (sparse), C uses date style,
  // D booleans, E inline string, plus a trailing blank row
  private val sheet1Xml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |  <sheetData>
      |    <row r="1">
      |      <c r="A1" t="s"><v>0</v></c>
      |      <c r="B1" t="s"><v>1</v></c>
      |      <c r="C1" t="s"><v>3</v></c>
      |      <c r="D1" t="s"><v>4</v></c>
      |      <c r="E1" t="inlineStr"><is><t>Observação</t></is></c>
      |    </row>
      |    <row r="2">
      |      <c r="A2"><v>3550308</v></c>
      |      <c r="B2" t="s"><v>2</v></c>
      |      <c r="C2" s="1"><v>45291</v></c>
      |      <c r="D2" t="b"><v>1</v></c>
      |      <c r="E2" t="str"><v>capital</v></c>
      |    </row>
      |    <row r="3">
      |      <c r="A3"><v>3304557</v></c>
      |      <c r="C3" s="2"><v>45292.5</v></c>
      |      <c r="D3" t="b"><v>0</v></c>
      |    </row>
      |    <row r="4">
      |      <c r="A4"><v>5300108</v></c>
      |      <c r="B4" t="inlineStr"><is><t>Brasília</t></is></c>
      |      <c r="C4" s="1"><v>45293</v></c>
      |      <c r="D4" t="b"><v>1</v></c>
      |      <c r="E4" t="e"><v>#DIV/0!</v></c>
      |    </row>
      |    <row r="5"/>
      |  </sheetData>
      |</worksheet>""".stripMargin

  // sheet2: two header rows (MultiIndex) + mixed/short rows + a row-gap
  private val sheet2Xml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |  <sheetData>
      |    <row r="1">
      |      <c r="A1" t="inlineStr"><is><t>Valores</t></is></c>
      |      <c r="B1" t="inlineStr"><is><t>Valores</t></is></c>
      |      <c r="C1" t="inlineStr"><is><t>Meta</t></is></c>
      |    </row>
      |    <row r="2">
      |      <c r="A2" t="inlineStr"><is><t>2023</t></is></c>
      |      <c r="B2" t="inlineStr"><is><t>2024</t></is></c>
      |    </row>
      |    <row r="3">
      |      <c r="A3"><v>1.5</v></c>
      |      <c r="B3"><v>2</v></c>
      |      <c r="C3" t="inlineStr"><is><t>ok</t></is></c>
      |    </row>
      |    <row r="5">
      |      <c r="A5"><v>3</v></c>
      |      <c r="B5"><v>4.25</v></c>
      |      <c r="C5" s="3"><v>9.5</v></c>
      |    </row>
      |  </sheetData>
      |</worksheet>""".stripMargin

  private lazy val xlsx = makeXlsx(
    "xl/_rels/workbook.xml.rels" -> relsXml,
    "xl/workbook.xml" -> workbookXml,
    "xl/sharedStrings.xml" -> sharedXml,
    "xl/styles.xml" -> stylesXml,
    "xl/worksheets/sheet1.xml" -> sheet1Xml,
    "xl/worksheets/sheet2.xml" -> sheet2Xml)

  test("sheet names are listed in workbook order") {
    assert(ExcelSource.sheetNames(xlsx) == Seq("Relatório Geral", "Extras"))
  }

  test("default read: first sheet, header=0, slugified columns, typed") {
    val df = ExcelSource.read(spark, xlsx)
    assert(df.columns.toSeq ==
      Seq("codigo_ibge", "nome_do_municipio", "data_de_criacao", "ativo",
        "observacao"))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("codigo_ibge") == LongType)
    assert(types("nome_do_municipio") == StringType)
    assert(types("data_de_criacao") == TimestampType)
    assert(types("ativo") == BooleanType)
    assert(types("observacao") == StringType)

    val rows = df.orderBy("codigo_ibge").collect()
    assert(rows.length == 3)
    // sparse B3 and error-cell E4 surface as nulls
    val rio = rows.find(_.getLong(0) == 3304557L).get
    assert(rio.isNullAt(1) && !rio.getBoolean(3))
    val bsb = rows.find(_.getLong(0) == 5300108L).get
    assert(bsb.getString(1) == "Brasília" && bsb.isNullAt(4))
    // rich-text shared string concatenates its runs
    val sp = rows.find(_.getLong(0) == 3550308L).get
    assert(sp.getString(1) == "São Paulo")
    // serial 45291 = 2023-12-31; 45292.5 has a time-of-day fraction
    assert(sp.getTimestamp(2).toString.startsWith("2023-12-31"))
    assert(rio.getTimestamp(2).toString.startsWith("2024-01-01 12:00"))
  }

  test("sheet by name, multi-row header flattens like the reference") {
    val df = ExcelSource.read(spark, xlsx, sheet = Right("Extras"),
      header = Seq(0, 1))
    // '_'.join(col) then slugify (samba_services.py:156-158)
    assert(df.columns.toSeq == Seq("valores_2023", "valores_2024", "meta"))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("valores_2023") == DoubleType)  // 1.5, 3 -> double
    assert(types("valores_2024") == DoubleType)
    assert(types("meta") == StringType)          // "ok", 9.5 -> mixed
    // row-gap (r=4 absent) is an all-null row, like a blank Excel line
    assert(df.count() == 3)
    assert(df.filter("valores_2023 IS NULL").count() == 1)
    // the custom "dias:" format is NOT a date (quoted literal ignored)
    assert(df.filter("meta = '9.5'").count() == 1)
  }

  test("header=None analogue: positional col_N names, all rows are data") {
    val df = ExcelSource.read(spark, xlsx, sheet = Right("Extras"),
      header = Seq.empty)
    assert(df.columns.toSeq == Seq("col_0", "col_1", "col_2"))
    // both header-ish rows surface as data; the r=4 gap is an all-null row
    assert(df.count() == 5)
  }

  test("missing sheet name raises with the available names") {
    val e = intercept[IllegalArgumentException] {
      ExcelSource.read(spark, xlsx, sheet = Right("nope"))
    }
    assert(e.getMessage.contains("Relatório Geral"))
  }

  test("format-code date detection honors quoting and brackets") {
    assert(ExcelSource.isDateFormatCode("dd/mm/yyyy"))
    assert(ExcelSource.isDateFormatCode("[$-409]h:mm AM/PM"))
    assert(!ExcelSource.isDateFormatCode("\"dias:\" 0.00"))
    assert(!ExcelSource.isDateFormatCode("#,##0.00"))
    assert(!ExcelSource.isDateFormatCode("[Red]0.0"))
  }

  test("column reference arithmetic") {
    assert(ExcelSource.colIndex("A1") == 0)
    assert(ExcelSource.colIndex("Z9") == 25)
    assert(ExcelSource.colIndex("AA10") == 26)
    assert(ExcelSource.colIndex("BC7") == 54)
  }
}
