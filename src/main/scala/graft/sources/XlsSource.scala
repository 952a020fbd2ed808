package graft.sources

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import ExcelSource.{Cell, SCell, NCell, BCell, TCell}

/** Legacy binary Excel (.xls, BIFF8) ingestion — the other spreadsheet
  * carrier behind the reference's `pd.read_excel` (samba_services.py:
  * 142-143; pandas dispatches .xls to xlrd the same way it dispatches
  * .xlsx to openpyxl). Like [[ExcelSource]] this is a minimal,
  * self-contained, JDK-only reader: no POI, no xlrd — a .xls file is an
  * OLE2/CFB compound document (MS-CFB) whose "Workbook" stream is a
  * sequence of little-endian BIFF8 records (MS-XLS).
  *
  * A workbook is driver-side, bounded data (same contract as
  * [[SheetSource]]/[[ExcelSource]]): parse on the driver, hand Spark a
  * typed DataFrame; the cell matrix feeds the SAME header-flattening /
  * slugify / dtype-inference path as .xlsx, so both carriers surface
  * identically.
  *
  * Supported surface:
  *   - CFB: 512/4096-byte sectors, DIFAT chains, FAT chains, directory,
  *     and the mini-FAT/mini-stream path (streams under the 4096-byte
  *     cutoff — tiny real-world sheets land there)
  *   - BIFF8 globals: DATEMODE (1904 system), FORMAT + XF records for
  *     date-style detection (same format-code heuristic as .xlsx),
  *     BOUNDSHEET, SST with CONTINUE splits (re-emitted grbit at each
  *     character-array resume, compressed and UTF-16 fragments mixed)
  *   - BIFF8 cells: LABELSST, NUMBER, RK, MULRK, LABEL, BOOLERR (errors
  *     -> null, like pandas NaN), BLANK/MULBLANK, FORMULA cached results
  *     (numeric, string via the following STRING record, boolean, error)
  *
  * BIFF5/7 (.xls written by Excel 5/95) is ALSO supported: the cell
  * records share their BIFF8 layouts, and the differences are confined
  * to strings — no SST (text arrives inline in LABEL/RSTRING byte
  * strings), 1-byte-length sheet/format names, and codepage-dependent
  * bytes decoded through the stream's CODEPAGE record (windows-1252
  * when absent, the overwhelmingly common case).
  */
object XlsSource {

  /** Read one worksheet of a .xls into a DataFrame (same parameters and
    * semantics as [[ExcelSource.read]]). */
  def read(
      spark: SparkSession,
      path: String,
      sheet: Either[Int, String] = Left(0),
      header: Seq[Int] = Seq(0),
      slugifyHeaders: Boolean = true): DataFrame =
    ExcelSource.toDataFrame(spark, readCells(path, sheet), header,
      slugifyHeaders)

  /** The workbook's sheet names in order (pd.ExcelFile.sheet_names). */
  def sheetNames(path: String): Seq[String] =
    parseGlobals(workbookStream(path)).sheets.map(_._1)

  // ================================================================ CFB

  private val EndOfChain = 0xFFFFFFFEL
  private val FreeSect = 0xFFFFFFFFL

  private class Cfb(bytes: Array[Byte]) {
    require(bytes.length >= 512 &&
      (0 until 8).forall(i => bytes(i) == CfbMagic(i)),
      "not an OLE2 compound file (bad magic) — is this really a .xls?")

    private def u16(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
    private def u32(off: Int): Long =
      (u16(off).toLong) | (u16(off + 2).toLong << 16)

    private val sectorSize = 1 << u16(30)
    private val miniSize = 1 << u16(32)
    private val firstDirSector = u32(48)
    private val miniCutoff = u32(56)
    private val firstMiniFatSector = u32(60)
    private val firstDifatSector = u32(68)
    private val maxSectors = (bytes.length / sectorSize) + 1

    // sector 0 starts at one sector-size from the file start: offset 512
    // for the common v3 (512-byte sectors), 4096 for v4 (4096-byte
    // sectors, whose 512-byte header is padded out to a full sector)
    private def sectorOff(sect: Long): Int = (sect.toInt + 1) * sectorSize

    /** FAT sector list: 109 header DIFAT slots, then the DIFAT chain. */
    private val fatSectors: Seq[Long] = {
      val out = mutable.ArrayBuffer[Long]()
      (0 until 109).foreach { i =>
        val s = u32(76 + i * 4)
        if (s != FreeSect && s != EndOfChain) out += s
      }
      var difat = firstDifatSector
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard < maxSectors) {
        val off = sectorOff(difat)
        (0 until sectorSize / 4 - 1).foreach { i =>
          val s = u32(off + i * 4)
          if (s != FreeSect && s != EndOfChain) out += s
        }
        difat = u32(off + sectorSize - 4)
        guard += 1
      }
      out.toSeq
    }

    private def fat(sect: Long): Long = {
      val perSector = sectorSize / 4
      val fs = fatSectors((sect / perSector).toInt)
      u32(sectorOff(fs) + (sect % perSector).toInt * 4)
    }

    /** Follow a FAT chain, concatenating sectors, truncating to size. */
    private def chainBytes(start: Long, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard < maxSectors) {
        require(sectorOff(s) + sectorSize <= bytes.length,
          s"truncated compound file: sector $s out of bounds")
        out.write(bytes, sectorOff(s), sectorSize)
        s = fat(s)
        guard += 1
      }
      require(s == EndOfChain || out.size() >= size,
        s"broken FAT chain starting at sector $start")
      out.toByteArray.take(math.min(size, out.size().toLong).toInt)
    }

    /** Directory entries: (name, objectType, startSector, size). */
    private val dirEntries: Seq[(String, Int, Long, Long)] = {
      val dir = chainBytes(firstDirSector, Long.MaxValue)
      (0 until dir.length / 128).map { i =>
        val off = i * 128
        def du16(o: Int) = (dir(off + o) & 0xFF) | ((dir(off + o + 1) & 0xFF) << 8)
        def du32(o: Int) = du16(o).toLong | (du16(o + 2).toLong << 16)
        val nameLen = du16(64) // bytes incl. UTF-16 terminator
        val name = if (nameLen >= 2)
          new String(dir, off, nameLen - 2, "UTF-16LE") else ""
        (name, dir(off + 66) & 0xFF, du32(116), du32(120))
      }
    }

    private lazy val miniFat: Array[Long] = {
      val raw = chainBytes(firstMiniFatSector, Long.MaxValue)
      Array.tabulate(raw.length / 4) { i =>
        ((raw(i * 4) & 0xFFL)) | ((raw(i * 4 + 1) & 0xFFL) << 8) |
          ((raw(i * 4 + 2) & 0xFFL) << 16) | ((raw(i * 4 + 3) & 0xFFL) << 24)
      }
    }

    /** The root entry's stream holds every mini-stream's sectors. */
    private lazy val miniContainer: Array[Byte] = {
      val root = dirEntries.find(_._2 == 5).getOrElse(
        sys.error("compound file has no root directory entry"))
      chainBytes(root._3, root._4)
    }

    private def miniChainBytes(start: Long, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      val maxMini = miniContainer.length / miniSize + 1
      while (s != EndOfChain && s != FreeSect && guard < maxMini) {
        require(s.toInt * miniSize + miniSize <= miniContainer.length &&
          s.toInt < miniFat.length,
          s"truncated compound file: mini sector $s out of bounds")
        out.write(miniContainer, s.toInt * miniSize, miniSize)
        s = miniFat(s.toInt)
        guard += 1
      }
      out.toByteArray.take(math.min(size, out.size().toLong).toInt)
    }

    /** A named stream's bytes (FAT or mini-FAT placement by size). */
    def stream(names: Seq[String]): Option[Array[Byte]] =
      dirEntries.find(e => e._2 == 2 && names.contains(e._1)).map { e =>
        if (e._4 < miniCutoff) miniChainBytes(e._3, e._4)
        else chainBytes(e._3, e._4)
      }
  }

  private val CfbMagic =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  private def workbookStream(path: String): Array[Byte] = {
    val cfb = new Cfb(Files.readAllBytes(Paths.get(path)))
    cfb.stream(Seq("Workbook", "Book")).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no Workbook stream — not an Excel .xls file"))
  }

  // ============================================================== BIFF8

  // record ids (MS-XLS §2.3)
  private val RBof = 0x0809; private val REof = 0x000A
  private val RContinue = 0x003C
  private val RDateMode = 0x0022
  private val RFormat = 0x041E; private val RXf = 0x00E0
  private val RBoundSheet = 0x0085; private val RSst = 0x00FC
  private val RLabelSst = 0x00FD; private val RNumber = 0x0203
  private val RRk = 0x027E; private val RMulRk = 0x00BD
  private val RLabel = 0x0204; private val RBoolErr = 0x0205
  private val RBlank = 0x0201; private val RMulBlank = 0x00BE
  private val RFormula = 0x0006; private val RString = 0x0207
  private val RShrFmla = 0x04BC; private val RArray = 0x0221
  private val RTable = 0x0236
  private val RCodepage = 0x0042; private val RRstring = 0x00D6

  /** One raw record: id + data slice. */
  private case class Rec(id: Int, data: Array[Byte])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    u16(b, o).toLong | (u16(b, o + 2).toLong << 16)
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    (0 until 8).foreach(i => bits |= (b(o + i) & 0xFFL) << (8 * i))
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Iterate records from `from` until the matching EOF (exclusive). */
  private def records(stream: Array[Byte], from: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var off = from
      private var done = false
      def hasNext: Boolean = !done && off + 4 <= stream.length
      def next(): Rec = {
        val id = u16(stream, off)
        val len = u16(stream, off + 2)
        val data = java.util.Arrays.copyOfRange(stream, off + 4,
          math.min(off + 4 + len, stream.length))
        off += 4 + len
        if (id == REof) done = true
        Rec(id, data)
      }
    }

  /** RK-encoded number (MS-XLS §2.5.276): bit0 = /100, bit1 = int30 vs
    * high-30-bits-of-double. */
  private[sources] def decodeRk(v: Long): Double = {
    val base =
      if ((v & 2L) != 0) (v.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((v & 0xFFFFFFFCL) << 32)
    if ((v & 1L) != 0) base / 100 else base
  }

  /** Cursor over an SST record plus its CONTINUE records. A string's
    * character array may split at any character boundary; each resumed
    * fragment re-declares its own compressed/UTF-16 flag byte (MS-XLS
    * §2.5.293 XLUnicodeRichExtendedString + §2.1.4 Continue). Run and
    * ExtRst payloads split WITHOUT a re-declared flag. */
  private class SstCursor(parts: IndexedSeq[Array[Byte]]) {
    private var p = 0
    private var off = 0

    private def ensure(): Unit = {
      while (p < parts.length && off >= parts(p).length) { p += 1; off = 0 }
      require(p < parts.length, "SST truncated (ran past last CONTINUE)")
    }
    def u8(): Int = { ensure(); val v = parts(p)(off) & 0xFF; off += 1; v }
    def u16le(): Int = u8() | (u8() << 8)
    def u32le(): Long = u16le().toLong | (u16le().toLong << 16)
    /** Bytes left in the current record fragment. */
    private def left(): Int = { ensure(); parts(p).length - off }

    /** Skip `n` bytes of non-character payload (may cross records). */
    def skip(n: Long): Unit = {
      var r = n
      while (r > 0) { val c = math.min(left().toLong, r).toInt; off += c; r -= c }
    }

    /** One XLUnicodeRichExtendedString. */
    def readString(): String = {
      val cch = u16le()
      var grbit = u8()
      val cRun = if ((grbit & 8) != 0) u16le() else 0
      val cbExt = if ((grbit & 4) != 0) u32le() else 0L
      // fragment the header ended in: whenever the character array
      // resumes in a LATER fragment (CONTINUE record), it re-declares
      // its own compressed/UTF-16 flag byte first
      var curPart = p
      val sb = new StringBuilder
      var got = 0
      while (got < cch) {
        ensure()
        if (p != curPart) { grbit = u8(); curPart = p }
        val wide = (grbit & 1) != 0
        val width = if (wide) 2 else 1
        val take = math.min(cch - got, left() / width)
        require(take > 0, "SST fragment too short for one character")
        (0 until take).foreach { _ =>
          sb.append(if (wide) u16le().toChar else u8().toChar)
        }
        got += take
      }
      skip(cRun.toLong * 4 + cbExt)
      sb.toString
    }
  }

  /** Globals-substream payload: sheets (name -> stream offset), shared
    * strings, date-styled XF indices, 1904 flag, BIFF5 mode + its
    * string codepage. */
  private case class Globals(
      sheets: Seq[(String, Int)],
      sst: IndexedSeq[String],
      dateXf: Set[Int],
      date1904: Boolean,
      biff5: Boolean,
      charset: java.nio.charset.Charset)

  /** CODEPAGE record value -> charset; 1252 (the overwhelmingly common
    * writer default) when absent or unknown. */
  private def charsetFor(cp: Int): java.nio.charset.Charset = {
    val name = cp match {
      case 1200 => "UTF-16LE"
      case 367 => "US-ASCII"
      case 10000 => "x-MacRoman"
      case c => s"windows-$c"
    }
    try java.nio.charset.Charset.forName(name)
    catch { case _: Exception =>
      java.nio.charset.Charset.forName("windows-1252")
    }
  }

  private def parseGlobals(wb: Array[Byte]): Globals = {
    val bof = records(wb, 0).next()
    require(bof.id == RBof, "workbook stream does not start with BOF")
    val version = u16(bof.data, 0)
    require(version == 0x0600 || version == 0x0500,
      f"unsupported BIFF version 0x$version%04X — only BIFF8 (Excel 97+) " +
        "and BIFF5/7 (Excel 5/95) are supported; re-save the file or " +
        "export CSV")
    val biff5 = version == 0x0500

    val sheets = mutable.ArrayBuffer[(String, Int)]()
    val xfFmts = mutable.ArrayBuffer[Int]()
    val customDate = mutable.Set[Int]()
    var date1904 = false
    var charset = java.nio.charset.Charset.forName("windows-1252")
    var sst: IndexedSeq[String] = IndexedSeq.empty
    val sstParts = mutable.ArrayBuffer[Array[Byte]]()
    var sstOpen = false

    records(wb, 0).foreach { rec =>
      if (rec.id != RContinue && sstOpen) sstOpen = false
      rec.id match {
        case RDateMode => date1904 = u16(rec.data, 0) == 1
        case RCodepage => charset = charsetFor(u16(rec.data, 0))
        case RFormat if biff5 =>
          // BIFF5 FORMAT: ifmt (2), then a BYTE string (cch8, chars)
          val ifmt = u16(rec.data, 0)
          val cch = rec.data(2) & 0xFF
          val code = new String(rec.data, 3, cch, charset)
          if (ExcelSource.isDateFormatCode(code)) customDate += ifmt
        case RFormat =>
          val ifmt = u16(rec.data, 0)
          // format string: XLUnicodeString (cch16, grbit, chars)
          val cch = u16(rec.data, 2)
          val wide = (rec.data(4) & 1) != 0
          val code =
            if (wide) new String(rec.data, 5, cch * 2, "UTF-16LE")
            else new String(rec.data.slice(5, 5 + cch).map(b => (b & 0xFF).toChar))
          if (ExcelSource.isDateFormatCode(code)) customDate += ifmt
        case RXf => xfFmts += u16(rec.data, 2)
        case RBoundSheet =>
          val pos = u32(rec.data, 0).toInt
          val visibleType = rec.data(5) & 0xFF // dt: 0 = worksheet
          val cch = rec.data(6) & 0xFF
          val name =
            if (biff5) new String(rec.data, 7, cch, charset) // BYTE string
            else {
              val wide = (rec.data(7) & 1) != 0
              if (wide) new String(rec.data, 8, cch * 2, "UTF-16LE")
              else new String(rec.data.slice(8, 8 + cch).map(b => (b & 0xFF).toChar))
            }
          if (visibleType == 0) sheets += name -> pos
        case RSst => sstParts += rec.data; sstOpen = true
        case RContinue if sstOpen => sstParts += rec.data
        case _ =>
      }
    }
    if (sstParts.nonEmpty) {
      val cur = new SstCursor(sstParts.toIndexedSeq)
      cur.skip(4) // cstTotal
      val unique = cur.u32le().toInt
      sst = IndexedSeq.fill(unique)(cur.readString())
    }
    val dateXf = xfFmts.zipWithIndex.collect {
      case (fmt, i) if ExcelSource.builtinDateFmts(fmt) || customDate(fmt) => i
    }.toSet
    Globals(sheets.toSeq, sst, dateXf, date1904, biff5, charset)
  }

  /** Dense row matrix of the selected sheet; `None` = blank cell. */
  private def readCells(path: String, sheet: Either[Int, String])
      : IndexedSeq[IndexedSeq[Option[Cell]]] = {
    val wb = workbookStream(path)
    val g = parseGlobals(wb)
    val (name, pos) = sheet match {
      case Left(i) => g.sheets.lift(i).getOrElse(
        throw new IllegalArgumentException(
          s"sheet index $i out of range (${g.sheets.length} sheets)"))
      case Right(n) => g.sheets.find(_._1 == n).getOrElse(
        throw new IllegalArgumentException(
          s"no sheet named '$n' in ${g.sheets.map(_._1).mkString(", ")}"))
    }

    val cells = mutable.Map[(Int, Int), Option[Cell]]()
    def num(rw: Int, colc: Int, ixfe: Int, d: Double): Unit =
      cells((rw, colc)) = Some(
        if (g.dateXf(ixfe)) TCell(ExcelSource.serialToTimestamp(d, g.date1904))
        else NCell(d))

    var pendingStringCell: Option[(Int, Int)] = None
    val it = records(wb, pos).buffered
    while (it.hasNext) {
      val rec = it.next()
      rec.id match {
        case RString =>
          // cached string result of the preceding FORMULA; a long value
          // overflows into CONTINUE records, each character-array resume
          // re-declaring its own flag byte (same rule as SST strings).
          // BIFF5: a plain BYTE string (cch16, codepage chars), no flag.
          val parts = mutable.ArrayBuffer(rec.data)
          while (it.hasNext && it.head.id == RContinue) parts += it.next().data
          pendingStringCell.foreach { rc =>
            cells(rc) = Some(SCell(
              if (g.biff5) {
                val all = parts.reduce(_ ++ _)
                new String(all, 2, u16(all, 0), g.charset)
              } else new SstCursor(parts.toIndexedSeq).readString()))
          }
          pendingStringCell = None
        case RShrFmla | RArray | RTable | RContinue =>
          // these legitimately sit between a FORMULA and its STRING
          // record — the pending cell must survive them
          ()
        case other =>
          pendingStringCell = None
          other match {
            case RLabelSst =>
              val s = g.sst.lift(u32(rec.data, 6).toInt)
              cells((u16(rec.data, 0), u16(rec.data, 2))) = s.map(SCell)
            case RNumber =>
              num(u16(rec.data, 0), u16(rec.data, 2), u16(rec.data, 4),
                f64(rec.data, 6))
            case RRk =>
              num(u16(rec.data, 0), u16(rec.data, 2), u16(rec.data, 4),
                decodeRk(u32(rec.data, 6)))
            case RMulRk =>
              val rw = u16(rec.data, 0)
              val colFirst = u16(rec.data, 2)
              val n = (rec.data.length - 6) / 6
              (0 until n).foreach { i =>
                num(rw, colFirst + i, u16(rec.data, 4 + i * 6),
                  decodeRk(u32(rec.data, 6 + i * 6)))
              }
            case RLabel | RRstring =>
              // RSTRING (formatted label) carries the same leading text
              // as LABEL; its trailing formatting runs are ignored —
              // text-only, like pandas. BIFF5 strings are BYTE strings
              // at offset 8 in the stream codepage; BIFF8 are
              // XLUnicodeStrings (flag byte then chars).
              val cch = u16(rec.data, 6)
              val s =
                if (g.biff5) new String(rec.data, 8, cch, g.charset)
                else {
                  val wide = (rec.data(8) & 1) != 0
                  if (wide) new String(rec.data, 9, cch * 2, "UTF-16LE")
                  else new String(rec.data.slice(9, 9 + cch).map(b => (b & 0xFF).toChar))
                }
              cells((u16(rec.data, 0), u16(rec.data, 2))) = Some(SCell(s))
            case RBoolErr =>
              val isErr = (rec.data(7) & 0xFF) != 0
              cells((u16(rec.data, 0), u16(rec.data, 2))) =
                if (isErr) None // error cell -> null, like pandas NaN
                else Some(BCell((rec.data(6) & 0xFF) != 0))
            case RBlank =>
              cells((u16(rec.data, 0), u16(rec.data, 2))) = None
            case RMulBlank =>
              val rw = u16(rec.data, 0)
              val colFirst = u16(rec.data, 2)
              val n = (rec.data.length - 6) / 2
              (0 until n).foreach(i => cells((rw, colFirst + i)) = None)
            case RFormula =>
              val rw = u16(rec.data, 0); val c = u16(rec.data, 2)
              val ixfe = u16(rec.data, 4)
              if (u16(rec.data, 12) == 0xFFFF) (rec.data(6) & 0xFF) match {
                case 0 => pendingStringCell = Some((rw, c)) // STRING follows
                case 1 => cells((rw, c)) = Some(BCell((rec.data(8) & 0xFF) != 0))
                case 3 => cells((rw, c)) = Some(SCell(""))
                case _ => cells((rw, c)) = None // cached error
              } else num(rw, c, ixfe, f64(rec.data, 6))
            case _ =>
          }
      }
    }

    if (cells.isEmpty) return IndexedSeq.empty
    val nRows = cells.keys.map(_._1).max + 1
    val rows = (0 until nRows).map { r =>
      val rowCells = cells.collect { case ((`r`, c), v) => c -> v }
      if (rowCells.isEmpty) IndexedSeq.empty[Option[Cell]]
      else {
        val w = rowCells.keys.max + 1
        (0 until w).map(c => rowCells.getOrElse(c, None)).toIndexedSeq
      }
    }
    // drop trailing all-blank rows (parity with the .xlsx reader)
    rows.reverse.dropWhile(_.forall(_.isEmpty)).reverse.toIndexedSeq
  }
}
