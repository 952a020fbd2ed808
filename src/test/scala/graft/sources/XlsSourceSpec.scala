package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

/** XlsSource against hand-written CFB + BIFF8 bytes (not produced by any
  * code under test — the builder below assembles records straight from
  * the MS-CFB / MS-XLS layouts). Covers: the mini-stream CFB path (small
  * workbook stream) and the FAT path (padded stream), SST CONTINUE splits
  * with a mid-string compressed->UTF-16 width change, RK int / x100 /
  * float encodings, MULRK, BOOLERR (errors -> null), FORMULA cached
  * numeric + string results, date-styled serials in both the 1900 and
  * 1904 systems, and the shared header/slugify/dtype pipeline. */
class XlsSourceSpec extends SparkSpec {

  // ----------------------------------------------------- byte assembly

  private class B {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): B = { out.write(v & 0xFF); this }
    def u16(v: Int): B = { u8(v); u8(v >> 8); this }
    def u32(v: Long): B = { u16(v.toInt); u16((v >> 16).toInt); this }
    def f64(d: Double): B = {
      val bits = java.lang.Double.doubleToLongBits(d)
      (0 until 8).foreach(i => u8(((bits >> (8 * i)) & 0xFF).toInt)); this
    }
    def ascii(s: String): B = { s.foreach(c => u8(c.toInt)); this }
    def utf16(s: String): B = { s.foreach(c => u16(c.toInt)); this }
    def bytes(b: Array[Byte]): B = { out.write(b); this }
    def pad(n: Int): B = { (0 until n).foreach(_ => u8(0)); this }
    def result(): Array[Byte] = out.toByteArray
  }

  private def rec(id: Int)(body: B => Unit): Array[Byte] = {
    val b = new B; body(b)
    val data = b.result()
    val h = new B; h.u16(id); h.u16(data.length); h.bytes(data)
    h.result()
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream(); parts.foreach(o.write); o.toByteArray
  }

  // --------------------------------------------------- BIFF8 workbook

  private def bof(dt: Int) = rec(0x0809) { b =>
    b.u16(0x0600).u16(dt).u16(0x0DBB).u16(0x07CC).u32(0).u32(0)
  }
  private def eof() = rec(0x000A)(_ => ())
  private def xf(ifmt: Int) = rec(0x00E0)(b => b.u16(0).u16(ifmt).pad(16))
  private def numberCell(rw: Int, c: Int, ixfe: Int, v: Double) =
    rec(0x0203)(b => b.u16(rw).u16(c).u16(ixfe).f64(v))
  private def rkCell(rw: Int, c: Int, ixfe: Int, rk: Long) =
    rec(0x027E)(b => b.u16(rw).u16(c).u16(ixfe).u32(rk))
  private def labelSst(rw: Int, c: Int, isst: Int) =
    rec(0x00FD)(b => b.u16(rw).u16(c).u16(0).u32(isst))
  private def boolCell(rw: Int, c: Int, v: Boolean) =
    rec(0x0205)(b => b.u16(rw).u16(c).u16(0).u8(if (v) 1 else 0).u8(0))
  private def errCell(rw: Int, c: Int) =
    rec(0x0205)(b => b.u16(rw).u16(c).u16(0).u8(0x07).u8(1))
  private def blankCell(rw: Int, c: Int) =
    rec(0x0201)(b => b.u16(rw).u16(c).u16(0))
  private def mulBlank(rw: Int, cFirst: Int, n: Int) =
    rec(0x00BE) { b =>
      b.u16(rw).u16(cFirst); (0 until n).foreach(_ => b.u16(0))
      b.u16(cFirst + n - 1)
    }
  private def mulRk(rw: Int, cFirst: Int, rks: Seq[Long]) =
    rec(0x00BD) { b =>
      b.u16(rw).u16(cFirst); rks.foreach(rk => b.u16(0).u32(rk))
      b.u16(cFirst + rks.length - 1)
    }
  private def labelCell(rw: Int, c: Int, s: String) =
    rec(0x0204)(b => b.u16(rw).u16(c).u16(0).u16(s.length).u8(0).ascii(s))
  private def formulaNum(rw: Int, c: Int, ixfe: Int, v: Double) =
    rec(0x0006)(b => b.u16(rw).u16(c).u16(ixfe).f64(v).u16(0).u32(0).u16(0))
  private def formulaStr(rw: Int, c: Int) =
    rec(0x0006) { b =>
      b.u16(rw).u16(c).u16(0)
      b.u8(0).u8(0).u8(0).u8(0).u8(0).u8(0).u16(0xFFFF) // cached-string marker
      b.u16(0).u32(0).u16(0)
    }
  private def stringRec(s: String) =
    rec(0x0207)(b => b.u16(s.length).u8(0).ascii(s))
  // SHRFMLA legitimately sits between a FORMULA and its STRING record
  private def shrFmla() = rec(0x04BC)(b => b.pad(10))
  // a STRING record split into a CONTINUE mid-character-array, switching
  // from compressed to UTF-16 at the resume (same rule as SST strings)
  private def stringSplit(first: String, second: String) = cat(
    rec(0x0207)(b => b.u16(first.length + second.length).u8(0).ascii(first)),
    rec(0x003C)(b => b.u8(1).utf16(second)))
  private def format(ifmt: Int, code: String) =
    rec(0x041E)(b => b.u16(ifmt).u16(code.length).u8(0).ascii(code))
  private def boundSheet(pos: Int, name: String) =
    rec(0x0085)(b => b.u32(pos).u8(0).u8(0).u8(name.length).u8(0).ascii(name))

  /** SST with 6 unique strings; string 2 ("AAAAAAAAAA" + "Ω" + "BBBBB")
    * splits into a CONTINUE mid-character-array, switching from
    * compressed to UTF-16 at the resume; string 5 carries a rich-text
    * run whose payload must be skipped. Strings 3-5 live entirely in the
    * CONTINUE. */
  private val splitString = "A" * 10 + "Ω" + "BBBBB"
  private def sstRecords: Array[Byte] = {
    val first = rec(0x00FC) { b =>
      b.u32(7).u32(6)
      b.u16(11).u8(0).ascii("Código IBGE".map(c => c.toChar).mkString) // compressed: low bytes
      b.u16(4).u8(0).ascii("Nome")
      b.u16(16).u8(0).ascii("A" * 10) // split string: header + 10 chars
    }
    val continue = rec(0x003C) { b =>
      b.u8(1).utf16("Ω" + "BBBBB") // resume: fresh flag, now UTF-16
      b.u16(6).u8(0).ascii("Criado")
      b.u16(5).u8(0).ascii("Ativo")
      b.u16(3).u8(0x08).u16(1).ascii("Obs").u32(0) // rich run skipped
    }
    cat(first, continue)
  }

  /** Two-sheet BIFF8 workbook stream. `date1904` flips the epoch;
    * `padGlobals` inflates the stream past the 4096 mini cutoff so the
    * CFB FAT path is exercised. */
  private def workbook(date1904: Boolean, padGlobals: Boolean): Array[Byte] = {
    def globals(pos1: Int, pos2: Int) = cat(
      bof(0x0005),
      rec(0x0022)(b => b.u16(if (date1904) 1 else 0)),
      format(164, "dd/mm/yyyy hh:mm"),
      format(165, "\"dias:\" 0.00"),
      xf(0), xf(14), xf(164), xf(165),
      if (padGlobals) rec(0x1234)(b => b.pad(6000)) else Array.empty[Byte],
      boundSheet(pos1, "Dados"),
      boundSheet(pos2, "Extras"),
      sstRecords,
      eof())
    val sheet1 = cat(
      bof(0x0010),
      labelSst(0, 0, 0), labelSst(0, 1, 1), labelSst(0, 2, 3),
      labelSst(0, 3, 4), labelSst(0, 4, 5),
      rkCell(1, 0, 0, (3550308L << 2) | 2), // RK int
      labelSst(1, 1, 2),                    // the CONTINUE-split string
      numberCell(1, 2, 1, 45291.0),         // built-in date style
      boolCell(1, 3, v = true),
      formulaStr(1, 4), stringRec("calc"),
      numberCell(2, 0, 0, 3304557.0),
      blankCell(2, 1),
      numberCell(2, 2, 2, 45292.5),         // custom date style
      errCell(2, 3),                        // #DIV/0! -> null
      labelCell(2, 4, "inline"),
      rkCell(3, 0, 0, (530010800L << 2) | 2 | 1), // RK int / 100
      labelSst(3, 1, 1),
      numberCell(3, 2, 1, 45293.0),
      boolCell(3, 3, v = false),
      formulaNum(3, 4, 0, 7.5),
      mulBlank(4, 0, 5),                    // trailing blank row dropped
      eof())
    val sheet2 = cat(
      bof(0x0010),
      mulRk(0, 0, Seq(0x3FF80000L, (2L << 2) | 2, 0x400A0000L)),
      // cached string result with an interposed SHRFMLA and the STRING
      // itself split across a CONTINUE with a width change
      formulaStr(1, 3), shrFmla(), stringSplit("SSS", "ZZZ"),
      eof())
    val size1 = globals(0, 0).length
    cat(globals(size1, size1 + sheet1.length), sheet1, sheet2)
  }

  // ----------------------------------------------------- CFB container

  private val EOC = 0xFFFFFFFEL
  private val FREE = 0xFFFFFFFFL

  private def dirEntry(name: String, objType: Int, start: Long,
      size: Long): Array[Byte] = {
    val b = new B
    b.utf16(name); b.pad(64 - name.length * 2)
    b.u16((name.length + 1) * 2).u8(objType).u8(1)
    b.u32(FREE).u32(FREE).u32(if (objType == 5) 1 else FREE)
    b.pad(16).u32(0).pad(16) // clsid, state bits, timestamps
    b.u32(start).u32(size).u32(0)
    b.result()
  }

  private def cfbHeader(numFat: Int, firstDir: Long, firstMiniFat: Long,
      numMiniFat: Int, difat0: Long): Array[Byte] = {
    val b = new B
    b.bytes(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    b.pad(16)                         // clsid
    b.u16(0x003E).u16(0x0003)         // minor/major
    b.u16(0xFFFE)                     // little-endian marker
    b.u16(9).u16(6)                   // sector / mini shifts
    b.pad(6).u32(0)                   // reserved, dir sector count (v3: 0)
    b.u32(numFat).u32(firstDir).u32(0)
    b.u32(4096)                       // mini cutoff
    b.u32(firstMiniFat).u32(numMiniFat)
    b.u32(EOC).u32(0)                 // no DIFAT chain
    b.u32(difat0)
    (1 until 109).foreach(_ => b.u32(FREE))
    b.result()
  }

  private def sectorize(data: Array[Byte], sectorSize: Int): Array[Byte] = {
    val n = (data.length + sectorSize - 1) / sectorSize
    java.util.Arrays.copyOf(data, math.max(1, n) * sectorSize)
  }

  /** Assemble a .xls: workbook stream via the FAT (>= 4096 bytes) or the
    * mini-stream (< 4096), mirroring a real writer's placement rule. */
  private def makeXls(stream: Array[Byte]): String = {
    val o = new ByteArrayOutputStream()
    if (stream.length >= 4096) {
      // sector 0: FAT, 1: directory, 2..: stream
      val streamSectors = (stream.length + 511) / 512
      val fat = new B
      fat.u32(0xFFFFFFFDL) // FAT sector marker
      fat.u32(EOC)         // directory chain
      (0 until streamSectors).foreach(i =>
        fat.u32(if (i == streamSectors - 1) EOC else i + 3))
      (0 until 128 - 2 - streamSectors).foreach(_ => fat.u32(FREE))
      val dir = cat(dirEntry("Root Entry", 5, EOC, 0),
        dirEntry("Workbook", 2, 2, stream.length))
      o.write(cfbHeader(1, 1, EOC, 0, 0))
      o.write(fat.result())
      o.write(sectorize(dir, 512))
      o.write(sectorize(stream, 512))
    } else {
      // sector 0: FAT, 1: directory, 2: mini-FAT, 3..: mini container
      val container = sectorize(stream, 64)
      val contSectors = (container.length + 511) / 512
      val miniSectors = container.length / 64
      val fat = new B
      fat.u32(0xFFFFFFFDL)
      fat.u32(EOC) // directory
      fat.u32(EOC) // mini-FAT
      (0 until contSectors).foreach(i =>
        fat.u32(if (i == contSectors - 1) EOC else i + 4))
      (0 until 128 - 3 - contSectors).foreach(_ => fat.u32(FREE))
      val miniFat = new B
      (0 until miniSectors).foreach(i =>
        miniFat.u32(if (i == miniSectors - 1) EOC else i + 1))
      (0 until 128 - miniSectors).foreach(_ => miniFat.u32(FREE))
      val dir = cat(dirEntry("Root Entry", 5, 3, container.length),
        dirEntry("Workbook", 2, 0, stream.length))
      o.write(cfbHeader(1, 1, 2, 1, 0))
      o.write(fat.result())
      o.write(sectorize(dir, 512))
      o.write(miniFat.result())
      o.write(sectorize(container, 512))
    }
    val f = Files.createTempFile("graft_xls", ".xls")
    Files.write(f, o.toByteArray)
    f.toFile.deleteOnExit()
    f.toString
  }

  private lazy val xlsSmall = makeXls(workbook(date1904 = false, padGlobals = false))
  private lazy val xlsFat = makeXls(workbook(date1904 = true, padGlobals = true))

  // ------------------------------------------------------ BIFF5 fixture

  /** Excel-95 era records: BYTE strings in the stream codepage, no SST,
    * 1-byte-length names. */
  private def bof5(dt: Int) = rec(0x0809)(b => b.u16(0x0500).u16(dt))
  private def boundSheet5(pos: Int, name: String) =
    rec(0x0085)(b => b.u32(pos).u8(0).u8(0).u8(name.length).ascii(name))
  private def format5(ifmt: Int, code: String) =
    rec(0x041E)(b => b.u16(ifmt).u8(code.length).ascii(code))
  private def label5(rw: Int, c: Int, bytes: Array[Byte]) =
    rec(0x0204)(b => b.u16(rw).u16(c).u16(0).u16(bytes.length).bytes(bytes))
  private def rstring5(rw: Int, c: Int, s: String) =
    rec(0x00D6) { b =>
      b.u16(rw).u16(c).u16(0).u16(s.length).ascii(s)
      b.u8(1).u8(0).u8(0) // one trailing formatting run, ignored
    }
  private def string5(s: String) =
    rec(0x0207)(b => b.u16(s.length).ascii(s))

  /** One-sheet BIFF5 workbook: codepage 1252 header strings, inline
    * labels (incl. a 0x80-0x9F codepage char), dates via FORMAT/XF,
    * RSTRING, and a FORMULA whose cached string is a BIFF5 STRING. */
  private def workbook5: Array[Byte] = {
    // windows-1252: 0x93/0x94 are curly quotes — absent from latin-1
    val curly = Array[Byte](0x93.toByte, 0x6F, 0x6B, 0x94.toByte)
    def globals(pos: Int) = cat(
      bof5(0x0005),
      rec(0x0042)(b => b.u16(1252)),           // CODEPAGE
      rec(0x0022)(b => b.u16(0)),              // 1900 system
      format5(164, "dd/mm/yyyy"),
      xf(0), xf(164),
      boundSheet5(pos, "Plan1"),
      eof())
    val sheet = cat(
      bof5(0x0010),
      label5(0, 0, "id".getBytes("windows-1252")),
      label5(0, 1, "nome".getBytes("windows-1252")),
      label5(0, 2, "quando".getBytes("windows-1252")),
      label5(0, 3, "obs".getBytes("windows-1252")),
      numberCell(1, 0, 0, 1.0),
      label5(1, 1, curly),                     // codepage-only chars
      numberCell(1, 2, 1, 45291.0),            // custom date XF
      rstring5(1, 3, "rich"),
      numberCell(2, 0, 0, 2.0),
      label5(2, 1, "b".getBytes("windows-1252")),
      numberCell(2, 2, 1, 45292.0),
      formulaStr(2, 3), string5("calc5"),
      eof())
    val g = globals(0)
    cat(globals(g.length), sheet)
  }

  private lazy val xls5 = makeXls(workbook5)

  test("BIFF5 (Excel 95): codepage strings, dates, RSTRING, formula string") {
    assert(XlsSource.sheetNames(xls5) == Seq("Plan1"))
    val df = XlsSource.read(spark, xls5)
    assert(df.columns.toSeq == Seq("id", "nome", "quando", "obs"))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == LongType)
    assert(types("quando") == TimestampType)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    // windows-1252 0x93/0x94 decode to curly quotes, not latin-1 controls
    assert(rows(0).getString(1) == "“ok”")
    assert(rows(0).getTimestamp(2).toString.startsWith("2023-12-31"))
    assert(rows(0).getString(3) == "rich")     // RSTRING text, runs dropped
    assert(rows(1).getString(3) == "calc5")    // BIFF5 STRING result
  }

  // --------------------------------------------------------------- tests

  test("small fixture really exercises the mini-stream path") {
    assert(workbook(date1904 = false, padGlobals = false).length < 4096)
    assert(workbook(date1904 = true, padGlobals = true).length >= 4096)
  }

  test("sheet names are listed in workbook order") {
    assert(XlsSource.sheetNames(xlsSmall) == Seq("Dados", "Extras"))
  }

  test("default read: typed columns, slugified headers (mini-stream CFB)") {
    val df = XlsSource.read(spark, xlsSmall)
    assert(df.columns.toSeq ==
      Seq("codigo_ibge", "nome", "criado", "ativo", "obs"))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("codigo_ibge") == LongType)
    assert(types("nome") == StringType)
    assert(types("criado") == TimestampType)
    assert(types("ativo") == BooleanType)
    assert(types("obs") == StringType)

    val rows = df.orderBy("codigo_ibge").collect()
    assert(rows.length == 3)
    // RK int, plain NUMBER, and RK/100 all surface as longs
    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(3304557L, 3550308L, 5300108L))
    // the CONTINUE-split SST string reassembles across the width change
    val sp = rows.find(_.getLong(0) == 3550308L).get
    assert(sp.getString(1) == splitString)
    // 1900-system serials: 45291 = 2023-12-31; 45292.5 carries time
    assert(sp.getTimestamp(2).toString.startsWith("2023-12-31"))
    val rio = rows.find(_.getLong(0) == 3304557L).get
    assert(rio.getTimestamp(2).toString.startsWith("2024-01-01 12:00"))
    // BLANK -> null; BOOLERR error -> null; FORMULA cached results
    assert(rio.isNullAt(1) && rio.isNullAt(3))
    assert(sp.getBoolean(3))
    assert(sp.getString(4) == "calc")     // FORMULA + STRING record
    assert(rio.getString(4) == "inline")  // LABEL inline string
    val bsb = rows.find(_.getLong(0) == 5300108L).get
    assert(!bsb.getBoolean(3))
    assert(bsb.getString(4) == "7.5")     // FORMULA cached numeric
  }

  test("sheet by name: MULRK decodes; FORMULA string survives SHRFMLA + split") {
    val df = XlsSource.read(spark, xlsSmall, sheet = Right("Extras"),
      header = Seq.empty)
    assert(df.columns.toSeq == Seq("col_0", "col_1", "col_2", "col_3"))
    val rows = df.collect()
    val r = rows(0)
    // whole-number column infers Long, fractional ones Double (same
    // per-column inference as the .xlsx reader)
    assert(r.getDouble(0) == 1.5 && r.getLong(1) == 2L &&
      r.getDouble(2) == 3.25 && r.isNullAt(3))
    // the cached string: FORMULA -> SHRFMLA (must not clear the pending
    // cell) -> STRING split across a CONTINUE with a width change
    assert(rows(1).getString(3) == "SSSZZZ")
  }

  test("FAT-path CFB + 1904 date system") {
    val df = XlsSource.read(spark, xlsFat)
    assert(df.count() == 3)
    // same serials, 1904 epoch: 1904-01-01 plus 45291 days
    val expected = java.time.LocalDate.of(1904, 1, 1).plusDays(45291)
    val sp = df.filter("codigo_ibge = 3550308").collect().head
    assert(sp.getTimestamp(2).toString.startsWith(expected.toString))
    assert(sp.getString(1) == splitString)
  }

  test("missing sheet name raises with the available names") {
    val e = intercept[IllegalArgumentException] {
      XlsSource.read(spark, xlsSmall, sheet = Right("nope"))
    }
    assert(e.getMessage.contains("Dados"))
  }

  test("non-OLE2 bytes are rejected with a clear error") {
    val f = Files.createTempFile("graft_notxls", ".xls")
    Files.write(f, "this,is,csv\n1,2,3\n".getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    val e = intercept[IllegalArgumentException] {
      XlsSource.read(spark, f.toString)
    }
    assert(e.getMessage.toLowerCase.contains("ole2"))
  }

  test("readAny dispatches on container magic, not extension") {
    // .xls bytes behind a lying extension still route to the BIFF reader
    val df = ExcelSource.readAny(spark, xlsSmall)
    assert(df.columns.toSeq.take(2) == Seq("codigo_ibge", "nome"))
    val e = intercept[IllegalArgumentException] {
      val f = Files.createTempFile("graft_neither", ".xlsx")
      Files.write(f, "neither".getBytes("UTF-8"))
      f.toFile.deleteOnExit()
      ExcelSource.readAny(spark, f.toString)
    }
    assert(e.getMessage.contains("neither"))
  }

  test("RK decoding covers all four encodings") {
    assert(XlsSource.decodeRk((12345L << 2) | 2) == 12345.0)
    assert(XlsSource.decodeRk((12345L << 2) | 2 | 1) == 123.45)
    assert(XlsSource.decodeRk(0x3FF80000L) == 1.5)
    assert(XlsSource.decodeRk(0x3FF80000L | 1) == 0.015)
    assert(XlsSource.decodeRk((-7L << 2) | 2) == -7.0)
  }
}
