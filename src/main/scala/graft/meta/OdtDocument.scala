package graft.meta

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Minimal OpenDocument Text (.odt) writer/filler — the document
  * container for the data dictionary (odf_tables.py:384-488), built on
  * the JDK only: an ODT file is a zip whose first entry is an UNCOMPRESSED
  * `mimetype` (so `file`-style magic sniffing works, per the ODF 1.2
  * packaging spec), plus `META-INF/manifest.xml` and `content.xml`.
  *
  * Two modes, mirroring the reference surface:
  *  - build from scratch: headings / paragraphs / named tables appended
  *    in order (DocumentWithTables.append_* in the reference);
  *  - template fill: load an existing .odt, locate `<table:table>`
  *    elements by `table:name`, and append data rows
  *    (create_data_dictionary_from_template / fill_template_table).
  *
  * This is driver-side presentation output (a document, not a dataset) —
  * bounded by schema sizes, never row counts, so no Spark plan is
  * involved.
  */
object OdtDocument {

  val Mimetype = "application/vnd.oasis.opendocument.text"

  private val ContentNs =
    """xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" """ +
    """xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" """ +
    """xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" """ +
    """office:version="1.2""""

  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Body fragments in document order. */
  sealed trait Block { def xml: String }

  final case class Heading(level: Int, text: String) extends Block {
    def xml: String =
      s"""<text:h text:outline-level="$level">${escape(text)}</text:h>"""
  }

  final case class Paragraph(text: String) extends Block {
    def xml: String = s"""<text:p>${escape(text)}</text:p>"""
  }

  /** A named table: one header row (in `<table:table-header-rows>`) and
    * data rows, all string-valued — the shape odf_tables.py emits. */
  final case class Table(
      name: String, columnNames: Seq[String],
      rows: ArrayBuffer[Seq[String]] = ArrayBuffer.empty) extends Block {
    private def cell(v: String): String =
      s"""<table:table-cell office:value-type="string">""" +
        s"""<text:p>${escape(v)}</text:p></table:table-cell>"""
    private def row(vs: Seq[String]): String =
      s"""<table:table-row>${vs.map(cell).mkString}</table:table-row>"""
    def xml: String =
      s"""<table:table table:name="${escape(name)}">""" +
        s"""<table:table-column table:number-columns-repeated="${columnNames.size}"/>""" +
        s"""<table:table-header-rows>${row(columnNames)}</table:table-header-rows>""" +
        rows.map(row).mkString +
        "</table:table>"
  }

  /** Ordered document builder (append-only, like the reference's
    * DocumentWithTables). */
  final class Builder {
    private val blocks = ArrayBuffer.empty[Block]
    private val tablesByName = LinkedHashMap.empty[String, Table]

    def heading(text: String, level: Int = 1): this.type = {
      blocks += Heading(level, text); this
    }
    def paragraph(text: String): this.type = { blocks += Paragraph(text); this }

    /** Append a named table (optionally preceded by a level-3 title
      * heading and a description paragraph, the reference's
      * create_title_and_description). */
    def table(name: String, columnNames: Seq[String],
        title: Option[String] = None,
        description: Option[String] = None): this.type = {
      title.foreach(t => blocks += Heading(3, t))
      description.foreach(d => blocks += Paragraph(d))
      val t = Table(name, columnNames)
      blocks += t
      tablesByName(name) = t
      this
    }

    def addRows(tableName: String, rows: Seq[Seq[String]]): this.type = {
      val t = tablesByName.getOrElse(tableName,
        sys.error(s"Table with id '$tableName' not found in document."))
      t.rows ++= rows
      this
    }

    def tableNames: Seq[String] = tablesByName.keys.toSeq

    def contentXml: String =
      s"""<?xml version="1.0" encoding="UTF-8"?>""" +
        s"""<office:document-content $ContentNs>""" +
        "<office:body><office:text>" +
        blocks.map(_.xml).mkString +
        "</office:text></office:body></office:document-content>"

    def save(path: String): Unit = writeOdt(path, contentXml)
  }

  def builder(): Builder = new Builder

  private val manifestXml: String =
    """<?xml version="1.0" encoding="UTF-8"?>""" +
      """<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">""" +
      s"""<manifest:file-entry manifest:full-path="/" manifest:media-type="$Mimetype"/>""" +
      """<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>""" +
      "</manifest:manifest>"

  /** Write the ODF package: STORED, comment-free `mimetype` first (the
    * spec's magic-sniffing rule), then manifest and content. Builder-created
    * documents carry the minimal manifest; template fills pass the
    * template's own entries through `carry` so styles.xml, meta.xml,
    * Pictures/ and the original manifest survive verbatim. */
  def writeOdt(path: String, contentXml: String,
      carry: Seq[(String, Array[Byte])] = Seq.empty): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      val mimeBytes = Mimetype.getBytes(UTF_8)
      val mimeEntry = new ZipEntry("mimetype")
      mimeEntry.setMethod(ZipEntry.STORED)
      mimeEntry.setSize(mimeBytes.length.toLong)
      val crc = new CRC32(); crc.update(mimeBytes)
      mimeEntry.setCrc(crc.getValue)
      zos.putNextEntry(mimeEntry); zos.write(mimeBytes); zos.closeEntry()
      def deflated(name: String, content: Array[Byte]): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content); zos.closeEntry()
      }
      val carried = carry.filter { case (n, _) =>
        n != "mimetype" && n != "content.xml"
      }.distinctBy(_._1)
      if (!carried.exists(_._1 == "META-INF/manifest.xml"))
        deflated("META-INF/manifest.xml", manifestXml.getBytes(UTF_8))
      carried.foreach { case (n, b) => deflated(n, b) }
      deflated("content.xml", contentXml.getBytes(UTF_8))
    } finally zos.close()
  }

  /** All zip entries of an .odt as (name, bytes), in archive order. */
  def readEntries(path: String): Seq[(String, Array[Byte])] = {
    val zis = new ZipInputStream(new FileInputStream(path))
    try {
      val out = ArrayBuffer.empty[(String, Array[Byte])]
      var e = zis.getNextEntry
      while (e != null) {
        val buf = new ByteArrayOutputStream()
        zis.transferTo(buf)
        out += ((e.getName, buf.toByteArray))
        e = zis.getNextEntry
      }
      out.toSeq
    } finally zis.close()
  }

  /** Template fill (fill_template_table): load `templatePath`, append
    * `rows` to every `<table:table>` whose table:name has an entry in
    * `rowsByTable`, write to `outPath`. Unknown table names raise, like
    * the reference. Uses the JDK DOM parser — namespace-aware. */
  def fillTemplate(templatePath: String, outPath: String,
      rowsByTable: Map[String, Seq[Seq[String]]]): Unit = {
    val entries = readEntries(templatePath)
    val content = new String(
      entries.find(_._1 == "content.xml")
        .getOrElse(sys.error(s"no content.xml in $templatePath"))._2, UTF_8)

    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(content.getBytes(UTF_8)))
    val tableNs = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
    val officeNs = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    val textNs = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    val tables = doc.getElementsByTagNameNS(tableNs, "table")
    val found = scala.collection.mutable.Set.empty[String]
    for (i <- 0 until tables.getLength) {
      val t = tables.item(i).asInstanceOf[org.w3c.dom.Element]
      val name = t.getAttributeNS(tableNs, "name")
      rowsByTable.get(name).foreach { rows =>
        found += name
        rows.foreach { vs =>
          val tr = doc.createElementNS(tableNs, "table:table-row")
          vs.foreach { v =>
            val td = doc.createElementNS(tableNs, "table:table-cell")
            td.setAttributeNS(officeNs, "office:value-type", "string")
            val p = doc.createElementNS(textNs, "text:p")
            p.setTextContent(v)
            td.appendChild(p)
            tr.appendChild(td)
          }
          t.appendChild(tr)
        }
      }
    }
    val missing = rowsByTable.keySet -- found
    if (missing.nonEmpty)
      sys.error(s"Table with id '${missing.head}' not found in document.")

    val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
    val sw = new java.io.StringWriter()
    tf.transform(new javax.xml.transform.dom.DOMSource(doc),
      new javax.xml.transform.stream.StreamResult(sw))
    writeOdt(outPath, sw.toString, carry = entries)
  }
}
