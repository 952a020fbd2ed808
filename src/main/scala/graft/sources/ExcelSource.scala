package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.Naming

/** Excel (.xlsx) ingestion — the reference's spreadsheet file carrier
  * (samba_services.py:142-143: `pd.read_excel(file_obj, sheet_name=…,
  * header=…)`, then MultiIndex flattening with `'_'.join` and
  * slugify_column_names, samba_services.py:156-161).
  *
  * A workbook is driver-side, bounded data (same contract as
  * [[SheetSource]]): parse on the driver, hand Spark a typed DataFrame.
  * No POI on the classpath — this is a minimal, self-contained OOXML
  * (ECMA-376) reader on JDK-only APIs: `java.util.zip` for the container,
  * StAX for the XML parts. Legacy binary `.xls` (BIFF8) is handled by the
  * companion [[XlsSource]], which shares this object's cell model and
  * DataFrame assembly.
  *
  * Supported surface, mirroring the pd.read_excel defaults the reference
  * relies on:
  *   - sheet selection by zero-based index or by name (`sheet_name=0`)
  *   - header row index, or several indices for a multi-row header that
  *     flattens to `level0_level1` names (`header=0`, `header=[0,1]`)
  *   - shared strings, inline strings, booleans, numbers, and
  *     date-formatted numerics (style-based detection: built-in numFmtIds
  *     14-22/45-47 plus custom formats with date tokens), matching how
  *     pandas surfaces cell types
  *   - per-column type inference (long / double / boolean / timestamp,
  *     else string), the DataFrame analogue of pandas' dtype inference
  *   - header slugify via [[Naming.slugify]] (always applied by the
  *     reference after read)
  */
object ExcelSource {

  /** One parsed cell. Numbers stay double until column inference.
    * Shared with [[XlsSource]] — both carriers produce the same typed
    * cell matrix and reuse [[toDataFrame]]. */
  private[sources] sealed trait Cell
  private[sources] case class SCell(v: String) extends Cell
  private[sources] case class NCell(v: Double) extends Cell
  private[sources] case class BCell(v: Boolean) extends Cell
  private[sources] case class TCell(v: java.sql.Timestamp) extends Cell

  /** Read one worksheet of an .xlsx into a DataFrame.
    *
    * @param sheet  Left(zero-based index) or Right(sheet name); default
    *               first sheet, like pandas `sheet_name=0`.
    * @param header header row indices (within the sheet, zero-based).
    *               Multiple indices flatten to `a_b` column names, the
    *               reference's MultiIndex treatment. Empty → no header:
    *               columns are `col_0, col_1, …` and every row is data.
    * @param slugifyHeaders apply [[Naming.slugify]] to the final names
    *               (the reference always does; disable for raw headers).
    */
  def read(
      spark: SparkSession,
      path: String,
      sheet: Either[Int, String] = Left(0),
      header: Seq[Int] = Seq(0),
      slugifyHeaders: Boolean = true): DataFrame =
    toDataFrame(spark, readCells(path, sheet), header, slugifyHeaders)

  /** Carrier-dispatching read — the full pd.read_excel surface: sniffs
    * the container magic (PK zip -> .xlsx OOXML, D0CF OLE2 -> .xls BIFF8)
    * instead of trusting the extension, then delegates to the matching
    * reader. */
  def readAny(
      spark: SparkSession,
      path: String,
      sheet: Either[Int, String] = Left(0),
      header: Seq[Int] = Seq(0),
      slugifyHeaders: Boolean = true): DataFrame = {
    val in = new java.io.FileInputStream(path)
    val magic = new Array[Byte](4)
    val got = try in.read(magic) finally in.close()
    if (got < 4) throw new IllegalArgumentException(
      s"$path is neither an OOXML (.xlsx) nor an OLE2 (.xls) workbook " +
        "(shorter than a container magic)")
    if (magic(0) == 'P' && magic(1) == 'K')
      read(spark, path, sheet, header, slugifyHeaders)
    else if ((magic(0) & 0xFF) == 0xD0 && (magic(1) & 0xFF) == 0xCF)
      XlsSource.read(spark, path, sheet, header, slugifyHeaders)
    else throw new IllegalArgumentException(
      s"$path is neither an OOXML (.xlsx) nor an OLE2 (.xls) workbook")
  }

  /** Cell matrix -> typed DataFrame: header flattening, slugify, per-
    * column dtype inference. Shared by the .xlsx and .xls readers (the
    * pandas-surface half of pd.read_excel, independent of the carrier). */
  private[sources] def toDataFrame(
      spark: SparkSession,
      rows: IndexedSeq[IndexedSeq[Option[Cell]]],
      header: Seq[Int],
      slugifyHeaders: Boolean): DataFrame = {
    val headerSet = header.toSet
    val nCols = rows.foldLeft(0)((m, r) => math.max(m, r.length))
    if (nCols == 0) return spark.emptyDataFrame

    def cellText(c: Cell): String = c match {
      case SCell(v) => v
      case NCell(v) => if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString
                       else v.toString
      case BCell(v) => v.toString
      case TCell(v) => v.toString
    }

    val names: Seq[String] =
      if (header.isEmpty) (0 until nCols).map(i => s"col_$i")
      else {
        val levels = header.map(i => rows.lift(i).getOrElse(IndexedSeq.empty))
        (0 until nCols).map { c =>
          val parts = levels.flatMap(_.lift(c).flatten).map(cellText)
            .map(_.trim).filter(_.nonEmpty)
          if (parts.isEmpty) s"col_$c" else parts.mkString("_")
        }
      }
    val finalNames = if (slugifyHeaders) names.map(Naming.slugify) else names

    val dataStart = if (header.isEmpty) 0 else header.max + 1
    val data = rows.zipWithIndex
      .filter { case (_, i) => i >= dataStart && !headerSet.contains(i) }
      .map(_._1)

    // per-column type inference over the data cells (pandas-dtype analogue)
    def colCells(c: Int): Seq[Cell] = data.flatMap(_.lift(c).flatten)
    val fields = (0 until nCols).map { c =>
      val cells = colCells(c)
      val dt: DataType =
        if (cells.isEmpty) StringType
        else if (cells.forall(_.isInstanceOf[TCell])) TimestampType
        else if (cells.forall(_.isInstanceOf[BCell])) BooleanType
        else if (cells.forall(_.isInstanceOf[NCell])) {
          if (cells.forall { case NCell(v) =>
                v.isWhole && math.abs(v) <= Long.MaxValue.toDouble; case _ => false })
            LongType
          else DoubleType
        } else StringType
      StructField(finalNames(c), dt, nullable = true)
    }
    val schema = StructType(fields)

    val sparkRows = data.map { r =>
      Row.fromSeq((0 until nCols).map { c =>
        r.lift(c).flatten match {
          case None => null
          case Some(cell) => fields(c).dataType match {
            case TimestampType => cell match { case TCell(v) => v; case _ => null }
            case BooleanType => cell match { case BCell(v) => v; case _ => null }
            case LongType => cell match { case NCell(v) => v.toLong; case _ => null }
            case DoubleType => cell match { case NCell(v) => v; case _ => null }
            case _ => cellText(cell)
          }
        }
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(sparkRows.toIndexedSeq), schema)
  }

  /** List the workbook's sheet names in order (pd.ExcelFile.sheet_names). */
  def sheetNames(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try parseWorkbook(zip).map(_._1)
    finally zip.close()
  }

  // ------------------------------------------------------------ container

  /** Dense row matrix of the selected sheet; `None` = blank cell. */
  private def readCells(path: String, sheet: Either[Int, String])
      : IndexedSeq[IndexedSeq[Option[Cell]]] = {
    val zip = new ZipFile(path)
    try {
      val sheets = parseWorkbook(zip)
      val target = sheet match {
        case Left(i) => sheets.lift(i).getOrElse(
          throw new IllegalArgumentException(
            s"sheet index $i out of range (${sheets.length} sheets)"))
        case Right(n) => sheets.find(_._1 == n).getOrElse(
          throw new IllegalArgumentException(
            s"no sheet named '$n' in ${sheets.map(_._1).mkString(", ")}"))
      }
      val shared = parseSharedStrings(zip)
      val dateXf = parseDateStyles(zip)
      parseSheet(zip, target._2, shared, dateXf)
    } finally zip.close()
  }

  private def open(zip: ZipFile, name: String): Option[InputStream] =
    Option(zip.getEntry(name)).map(zip.getInputStream)

  private def xml(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** workbook.xml + its rels → ordered (sheetName, partName). */
  private def parseWorkbook(zip: ZipFile): Seq[(String, String)] = {
    // rels: rId -> target part
    val rels = mutable.Map[String, String]()
    open(zip, "xl/_rels/workbook.xml.rels").foreach { in =>
      val r = xml(in)
      try while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val t0 = r.getAttributeValue(null, "Target")
          val t = if (t0.startsWith("/")) t0.drop(1)
                  else "xl/" + t0.stripPrefix("./")
          rels(id) = t
        }
      } finally { r.close(); in.close() }
    }
    val out = mutable.ArrayBuffer[(String, String)]()
    open(zip, "xl/workbook.xml").foreach { in =>
      val r = xml(in)
      try while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          // r:id lives in the officeDocument relationships namespace
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          rid.flatMap(rels.get).foreach(part => out += name -> part)
        }
      } finally { r.close(); in.close() }
    }
    out.toSeq
  }

  /** sharedStrings.xml → indexed strings (rich-text runs concatenated). */
  private def parseSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer[String]()
    open(zip, "xl/sharedStrings.xml").foreach { in =>
      val r = xml(in)
      val sb = new StringBuilder
      var inT = false
      var depth = 0
      try while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => sb.clear(); depth += 1
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += sb.toString; depth -= 1
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      } finally { r.close(); in.close() }
    }
    out.toIndexedSeq
  }

  /** Built-in date/time number formats (ECMA-376 §18.8.30; same ids in
    * BIFF8). */
  private[sources] val builtinDateFmts: Set[Int] = ((14 to 22) ++ (45 to 47)).toSet

  /** Does a custom format code render as a date/time? Date tokens outside
    * quoted literals / color-condition brackets. */
  private[sources] def isDateFormatCode(code: String): Boolean = {
    val sb = new StringBuilder
    var inQuote = false; var inBracket = false; var i = 0
    while (i < code.length) {
      val ch = code.charAt(i)
      if (inQuote) { if (ch == '"') inQuote = false }
      else if (inBracket) { if (ch == ']') inBracket = false }
      else ch match {
        case '"' => inQuote = true
        case '[' => inBracket = true
        case '\\' => i += 1 // escaped literal
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString.toLowerCase.exists("ymdhs".contains(_))
  }

  /** styles.xml → set of cellXfs indices that are date-formatted. */
  private def parseDateStyles(zip: ZipFile): Set[Int] = {
    val customDate = mutable.Set[Int]()
    val xfFmts = mutable.ArrayBuffer[Int]()
    open(zip, "xl/styles.xml").foreach { in =>
      val r = xml(in)
      var inCellXfs = false
      try while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            val id = r.getAttributeValue(null, "numFmtId").toInt
            val code = Option(r.getAttributeValue(null, "formatCode")).getOrElse("")
            if (isDateFormatCode(code)) customDate += id
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            xfFmts += Option(r.getAttributeValue(null, "numFmtId"))
              .map(_.toInt).getOrElse(0)
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      } finally { r.close(); in.close() }
    }
    xfFmts.zipWithIndex.collect {
      case (fmt, i) if builtinDateFmts(fmt) || customDate(fmt) => i
    }.toSet
  }

  /** Excel serial date → timestamp. Day 0 is 1899-12-30 (the 1900 leap-year
    * bug means serials ≥ 60 are shifted — using the -30 epoch matches what
    * every modern producer emits for dates after Feb 1900). Workbooks in
    * the 1904 date system (a BIFF DATEMODE flag, Mac-origin files) count
    * from 1904-01-01 instead. */
  private[sources] def serialToTimestamp(serial: Double,
      epoch1904: Boolean = false): java.sql.Timestamp = {
    val day0 = if (epoch1904) java.time.LocalDate.of(1904, 1, 1)
               else java.time.LocalDate.of(1899, 12, 30)
    val epoch = day0.atStartOfDay(java.time.ZoneOffset.UTC)
    val micros = math.round(serial * 86400d * 1e6)
    java.sql.Timestamp.from(epoch.toInstant.plus(
      micros, java.time.temporal.ChronoUnit.MICROS))
  }

  /** "BC7" → zero-based column 54. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def parseSheet(
      zip: ZipFile,
      part: String,
      shared: IndexedSeq[String],
      dateXf: Set[Int]): IndexedSeq[IndexedSeq[Option[Cell]]] = {
    val in = open(zip, part).getOrElse(
      throw new IllegalArgumentException(s"missing worksheet part $part"))
    val r = xml(in)
    val rows = mutable.ArrayBuffer[mutable.ArrayBuffer[Option[Cell]]]()
    var cur: mutable.ArrayBuffer[Option[Cell]] = null
    var cellType = ""; var cellStyle = -1; var cellCol = -1
    var inV = false; var inIsT = false
    val text = new StringBuilder
    var rowIndex = -1 // sheet row number (1-based from r=) for gap filling

    def put(cell: Option[Cell]): Unit = {
      while (cur.length < cellCol) cur += None
      cur += cell
    }
    def finishCell(): Unit = {
      val raw = text.toString
      val cell: Option[Cell] = cellType match {
        case "s" => raw.toIntOption.flatMap(shared.lift).map(SCell)
        case "str" => Some(SCell(raw))
        case "inlineStr" => Some(SCell(raw))
        case "b" => Some(BCell(raw.trim == "1"))
        case "e" => None // error cell -> null, like pandas NaN
        case _ => // "n" or absent: numeric; date-styled -> timestamp
          raw.trim.toDoubleOption.map { d =>
            if (dateXf(cellStyle)) TCell(serialToTimestamp(d)) else NCell(d)
          }
      }
      if (cell.isDefined || cellCol >= 0) put(cell)
    }

    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          val rAttr = Option(r.getAttributeValue(null, "r"))
            .flatMap(_.toIntOption).getOrElse(rows.length + 1)
          while (rows.length < rAttr - 1) rows += mutable.ArrayBuffer.empty
          cur = mutable.ArrayBuffer.empty
          rowIndex = rAttr
        case "c" =>
          cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
          cellStyle = Option(r.getAttributeValue(null, "s"))
            .flatMap(_.toIntOption).getOrElse(-1)
          cellCol = Option(r.getAttributeValue(null, "r"))
            .map(colIndex).getOrElse(if (cur == null) 0 else cur.length)
          text.clear()
        case "v" => inV = true
        case "t" if cellType == "inlineStr" => inIsT = true
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if inV || inIsT =>
        text.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" => inV = false
        case "t" => inIsT = false
        case "c" => finishCell(); cellType = ""; cellStyle = -1; cellCol = -1
        case "row" => rows += cur; cur = null
        case _ =>
      }
      case _ =>
    } finally { r.close(); in.close() }
    // drop trailing all-blank rows (Excel often persists empty trailing rows)
    rows.map(_.toIndexedSeq).reverse.dropWhile(_.forall(_.isEmpty))
      .reverse.toIndexedSeq
  }
}
