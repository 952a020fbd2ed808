package graft.meta

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types._

class OdtDocumentSpec extends AnyFunSuite {

  private val tableNs = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
  private val textNs = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"

  private def parse(xml: Array[Byte]): org.w3c.dom.Document = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    dbf.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(xml))
  }

  private def cellTexts(row: org.w3c.dom.Element): Seq[String] = {
    val cells = row.getElementsByTagNameNS(tableNs, "table-cell")
    (0 until cells.getLength).map(i => cells.item(i).getTextContent)
  }

  private val schema = StructType(Seq(
    StructField("id", LongType).withComment("the key"),
    StructField("name", StringType).withComment("display name"),
    StructField("score", DoubleType)))

  test("ODF packaging: uncompressed mimetype is the first zip entry") {
    val out = Files.createTempFile("dict", ".odt").toString
    DataDictionary.toOdt(out,
      Seq(DataDictionary.Resource("users", schema)), title = Some("Dict"))
    val entries = OdtDocument.readEntries(out)
    assert(entries.head._1 == "mimetype")
    assert(new String(entries.head._2, UTF_8) == OdtDocument.Mimetype)
    assert(entries.map(_._1).toSet ==
      Set("mimetype", "META-INF/manifest.xml", "content.xml"))
    // raw bytes: the mimetype string must appear verbatim (STORED) right
    // after the first local header — that's what magic sniffers read
    val raw = Files.readAllBytes(java.nio.file.Paths.get(out))
    assert(new String(raw.slice(38, 38 + OdtDocument.Mimetype.length), UTF_8)
      == OdtDocument.Mimetype)
  }

  test("document structure: headings, localized header row, field rows") {
    val out = Files.createTempFile("dict", ".odt").toString
    DataDictionary.toOdt(out,
      Seq(DataDictionary.Resource("users", schema,
        title = Some("Usuários"), description = Some("tabela de usuários"))),
      title = Some("Dicionário"), description = Some("pacote"), lang = "pt")
    val content = OdtDocument.readEntries(out).find(_._1 == "content.xml").get._2
    val doc = parse(content)

    val h = doc.getElementsByTagNameNS(textNs, "h")
    assert(h.getLength == 2)
    assert(h.item(0).getTextContent == "Dicionário")
    assert(h.item(1).getTextContent == "Usuários")
    assert(h.item(1).asInstanceOf[org.w3c.dom.Element]
      .getAttributeNS(textNs, "outline-level") == "3")

    val tables = doc.getElementsByTagNameNS(tableNs, "table")
    assert(tables.getLength == 1)
    val t = tables.item(0).asInstanceOf[org.w3c.dom.Element]
    assert(t.getAttributeNS(tableNs, "name") == "users")

    val headerRows = t.getElementsByTagNameNS(tableNs, "table-header-rows")
      .item(0).asInstanceOf[org.w3c.dom.Element]
    val header = headerRows.getElementsByTagNameNS(tableNs, "table-row")
      .item(0).asInstanceOf[org.w3c.dom.Element]
    assert(cellTexts(header) == Seq("nome do campo", "tipo", "descrição"))

    val allRows = t.getElementsByTagNameNS(tableNs, "table-row")
    // header + 3 fields
    assert(allRows.getLength == 4)
    assert(cellTexts(allRows.item(1).asInstanceOf[org.w3c.dom.Element])
      == Seq("id", "integer", "the key"))
    assert(cellTexts(allRows.item(3).asInstanceOf[org.w3c.dom.Element])
      == Seq("score", "number", ""))
  }

  test("XML escaping survives hostile text") {
    val out = Files.createTempFile("dict", ".odt").toString
    val hostile = StructType(Seq(
      StructField("a<b", StringType).withComment("""x & "y" <tag>""")))
    DataDictionary.toOdt(out, Seq(DataDictionary.Resource("t", hostile)))
    val doc = parse(
      OdtDocument.readEntries(out).find(_._1 == "content.xml").get._2)
    val rows = doc.getElementsByTagNameNS(tableNs, "table-row")
    assert(cellTexts(rows.item(1).asInstanceOf[org.w3c.dom.Element])
      == Seq("a<b", "string", """x & "y" <tag>"""))
  }

  test("template fill appends rows to the named table and only it") {
    val template = Files.createTempFile("tmpl", ".odt").toString
    OdtDocument.builder()
      .heading("Template")
      .table("users", Seq("field name", "type", "description"))
      .table("other", Seq("field name", "type", "description"))
      .save(template)
    val out = Files.createTempFile("filled", ".odt").toString
    OdtDocument.fillTemplate(template, out,
      Map("users" -> Seq(Seq("id", "integer", "the key"))))
    val doc = parse(
      OdtDocument.readEntries(out).find(_._1 == "content.xml").get._2)
    val tables = doc.getElementsByTagNameNS(tableNs, "table")
    val byName = (0 until tables.getLength)
      .map(i => tables.item(i).asInstanceOf[org.w3c.dom.Element])
      .map(t => t.getAttributeNS(tableNs, "name") -> t).toMap
    assert(byName("users").getElementsByTagNameNS(tableNs, "table-row")
      .getLength == 2) // header + 1 appended
    assert(byName("other").getElementsByTagNameNS(tableNs, "table-row")
      .getLength == 1) // header only
  }

  test("template fill carries styles.xml, Pictures/ and the template manifest") {
    // a LibreOffice-style template: styles.xml, meta.xml, an embedded
    // picture, and a manifest that lists them — none of which fillTemplate
    // rewrites, so all must survive the fill byte-identical
    val stylesXml = ("""<?xml version="1.0" encoding="UTF-8"?>""" +
      """<office:document-styles xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" office:version="1.2"/>""")
      .getBytes(UTF_8)
    val metaXml = ("""<?xml version="1.0" encoding="UTF-8"?>""" +
      """<office:document-meta xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" office:version="1.2"/>""")
      .getBytes(UTF_8)
    val picture = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val templateManifest = ("""<?xml version="1.0" encoding="UTF-8"?>""" +
      """<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">""" +
      s"""<manifest:file-entry manifest:full-path="/" manifest:media-type="${OdtDocument.Mimetype}"/>""" +
      """<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>""" +
      """<manifest:file-entry manifest:full-path="styles.xml" manifest:media-type="text/xml"/>""" +
      """<manifest:file-entry manifest:full-path="meta.xml" manifest:media-type="text/xml"/>""" +
      """<manifest:file-entry manifest:full-path="Pictures/p.bin" manifest:media-type="application/octet-stream"/>""" +
      "</manifest:manifest>").getBytes(UTF_8)

    val template = Files.createTempFile("tmpl", ".odt").toString
    val contentXml = {
      val tmp = Files.createTempFile("plain", ".odt").toString
      OdtDocument.builder()
        .table("users", Seq("field name", "type", "description"))
        .save(tmp)
      new String(
        OdtDocument.readEntries(tmp).find(_._1 == "content.xml").get._2, UTF_8)
    }
    OdtDocument.writeOdt(template, contentXml, carry = Seq(
      "META-INF/manifest.xml" -> templateManifest,
      "styles.xml" -> stylesXml,
      "meta.xml" -> metaXml,
      "Pictures/p.bin" -> picture))

    val out = Files.createTempFile("filled", ".odt").toString
    OdtDocument.fillTemplate(template, out,
      Map("users" -> Seq(Seq("id", "integer", "the key"))))

    val entries = OdtDocument.readEntries(out)
    val byName = entries.toMap
    assert(entries.map(_._1).count(_ == "META-INF/manifest.xml") == 1)
    assert(byName("META-INF/manifest.xml").sameElements(templateManifest))
    assert(byName("styles.xml").sameElements(stylesXml))
    assert(byName("meta.xml").sameElements(metaXml))
    assert(byName("Pictures/p.bin").sameElements(picture))
    // and the fill itself still happened
    val doc = parse(byName("content.xml"))
    assert(doc.getElementsByTagNameNS(tableNs, "table-row").getLength == 2)
  }

  test("writeOdt deduplicates carried entries by name (keep first)") {
    val out = Files.createTempFile("dup", ".odt").toString
    OdtDocument.writeOdt(out, "<x/>", carry = Seq(
      "styles.xml" -> "first".getBytes(UTF_8),
      "styles.xml" -> "second".getBytes(UTF_8)))
    val entries = OdtDocument.readEntries(out)
    assert(entries.map(_._1).count(_ == "styles.xml") == 1)
    assert(new String(entries.toMap.apply("styles.xml"), UTF_8) == "first")
  }

  test("template fill raises on a missing table name, like the reference") {
    val template = Files.createTempFile("tmpl", ".odt").toString
    OdtDocument.builder()
      .table("users", Seq("field name", "type", "description"))
      .save(template)
    val out = Files.createTempFile("filled", ".odt").toString
    val e = intercept[RuntimeException] {
      OdtDocument.fillTemplate(template, out,
        Map("nope" -> Seq(Seq("x", "y", "z"))))
    }
    assert(e.getMessage.contains("'nope' not found"))
  }
}
