package graft.operators

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, SaveMode}

/** In-database merge for JDBC destinations — the reference's incremental
  * landing step (fast_etl.py:601-610): stage the increment into a temp
  * table over JDBC, then run UPDATE-join + INSERT-NOT-EXISTS (or a single
  * ANSI MERGE) *inside* the destination RDBMS.
  *
  * This complements [[IncrementalSync.mergeBatch]] (which rebuilds the
  * merged relation in Spark, for lake/parquet destinations): when the
  * destination is an operational database, re-writing the whole table is
  * not an option — only the increment may cross the wire. Spark ships the
  * increment (distributed, batched inserts); the merge itself is one
  * set-based statement executed by the destination engine, mirroring
  * `_build_incremental_sqls` (fast_etl.py:430-451).
  *
  * Scale shape: wire cost and staging-table size are O(|increment|), the
  * in-DB merge is the destination's own join machinery. Nothing is
  * collected to the Spark driver.
  */
object JdbcMerge {

  /** Merge-statement dialect. */
  sealed trait Dialect

  /** Single ANSI `MERGE INTO` (Derby >= 10.11, MSSQL, Oracle, PG >= 15). */
  case object AnsiMerge extends Dialect

  /** The reference's exact pair: `UPDATE ... FROM` + `INSERT ... WHERE NOT
    * EXISTS` (fast_etl.py:437-450) — MSSQL/PostgreSQL syntax. */
  case object UpdateFromInsert extends Dialect

  /** Quote an identifier the way Spark's JDBC writer created it (quoted,
    * case-preserved). */
  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  /** Split a possibly schema-qualified name on dots that are OUTSIDE
    * quoted segments (`"my.table"` is one segment). */
  private def splitQualified(name: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inQ = false
    name.foreach {
      case '"' => inQ = !inQ; sb += '"'
      case '.' if !inQ => out += sb.result(); sb.clear()
      case c => sb += c
    }
    out += sb.result()
    out.result()
  }

  private val PlainIdent = "[A-Za-z_][A-Za-z0-9_]*"
  // every interior quote doubled — the only pre-quoted form that is safe
  // to interpolate verbatim (cannot terminate the quoted region early)
  private val QuotedIdent = "\"([^\"]|\"\")*\""

  /** Render one name segment safely for interpolation into merge SQL. */
  private def qSegment(seg: String): String =
    if (seg.matches(PlainIdent)) seg
    else if (seg.matches(QuotedIdent)) seg
    else q(seg)

  /** Render a table name safely for interpolation into merge SQL. Plain
    * identifier segments pass through verbatim (matching the unquoted
    * names Spark's JDBC writer creates, so engine case folding still
    * applies) and STRICTLY pre-quoted segments — interior quotes all
    * doubled — pass through untouched; anything else is (re)quoted with
    * embedded quotes doubled so it cannot break out of the statement.
    * The strictness matters: a segment that merely starts and ends with
    * `"` but carries a stray interior quote (`"x" d; DROP TABLE y; --"`)
    * would otherwise be interpolated verbatim and terminate the quoted
    * region mid-name. */
  private[operators] def qTable(name: String): String =
    splitQualified(name).map(qSegment).mkString(".")

  /** Strip strict quoting from a segment; non-quoted segments pass through. */
  private def unquoteSegment(seg: String): String =
    if (seg.matches(QuotedIdent))
      seg.substring(1, seg.length - 1).replace("\"\"", "\"")
    else seg

  /** Default staging-table name: the destination's last segment, unquoted,
    * with `_stage` appended, re-rendered safely (qualifier segments kept,
    * so the stage lands in the destination's schema). Deriving from the
    * RAW name (`destTable + "_stage"`) breaks for pre-quoted destinations:
    * `"we""ird"` + `_stage` is neither a valid identifier for the Spark
    * JDBC writer's verbatim `dbtable` interpolation nor quoted the same
    * way by [[qTable]] in the merge SQL. */
  private[operators] def defaultStageName(destTable: String): String = {
    val segs = splitQualified(destTable)
    val stage = unquoteSegment(segs.last) + "_stage"
    (segs.init.map(qSegment) :+ qSegment(stage)).mkString(".")
  }

  /** Pure SQL generation (unit-testable without a live database).
    *
    * @param columns every column of the staged increment, in order; must
    *                include `keys`.
    */
  def buildMergeSqls(
      destTable: String,
      stageTable: String,
      keys: Seq[String],
      columns: Seq[String],
      dialect: Dialect): Seq[String] = {
    require(keys.nonEmpty && keys.forall(columns.contains),
      s"keys $keys must be a subset of columns $columns")
    val dest = qTable(destTable)
    val stg = qTable(stageTable)
    val nonKeys = columns.filterNot(keys.contains)
    val on = keys.map(k => s"d.${q(k)} = s.${q(k)}").mkString(" AND ")
    dialect match {
      case AnsiMerge =>
        val set = nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
        val insCols = columns.map(q).mkString(", ")
        val insVals = columns.map(c => s"s.${q(c)}").mkString(", ")
        val matched =
          if (nonKeys.isEmpty) "" else s" WHEN MATCHED THEN UPDATE SET $set"
        Seq(
          s"MERGE INTO $dest d USING $stg s ON ($on)$matched" +
          s" WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)")
      case UpdateFromInsert =>
        // reference parity (fast_etl.py:437-450): UPDATE..FROM applies to
        // every matched row; the insert adds unmatched keys only
        val set = nonKeys.map(c => s"${q(c)} = orig.${q(c)}").mkString(", ")
        val onDest = keys.map(k => s"orig.${q(k)} = $dest.${q(k)}")
          .mkString(" AND ")
        val insCols = columns.map(q).mkString(", ")
        val notExists = keys.map(k => s"atual.${q(k)} = inc.${q(k)}")
          .mkString(" AND ")
        val update =
          if (nonKeys.isEmpty) Seq.empty
          else Seq(
            s"UPDATE $dest SET $set FROM $stg orig WHERE $onDest")
        update :+
          (s"INSERT INTO $dest ($insCols) SELECT $insCols " +
           s"FROM $stg AS inc WHERE NOT EXISTS " +
           s"(SELECT 1 FROM $dest AS atual WHERE $notExists)")
    }
  }

  private def withConnection[A](url: String, options: Map[String, String])
      (f: Connection => A): A = {
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Stage `increment` into `stageTable` over JDBC, merge it into
    * `destTable` inside the destination database, drop the stage.
    *
    * The staging write is Overwrite (table recreated with the increment's
    * schema, mirroring the reference's truncate-then-load of the `inc`
    * table); the merge statements run on a driver-side connection in one
    * transaction where the backend supports transactional DDL-free DML.
    */
  def merge(
      increment: DataFrame,
      url: String,
      destTable: String,
      keys: Seq[String],
      dialect: Dialect = AnsiMerge,
      stageTable: Option[String] = None,
      batchSize: Int = 10000,
      stageColumnTypes: Option[String] = None,
      options: Map[String, String] = Map.empty): Unit = {
    val stage = stageTable.getOrElse(defaultStageName(destTable))
    var w = increment.write.format("jdbc")
      .option("url", url)
      .option("dbtable", stage)
      .option("batchsize", batchSize)
      .options(options)
      .mode(SaveMode.Overwrite)
    // string keys staged as the default LOB type are not comparable in a
    // MERGE ON clause on some backends (Derby CLOB) — callers pass
    // TypeMapper.columnTypes(df.schema, dialect) to pin VARCHARs
    stageColumnTypes.foreach(t => w = w.option("createTableColumnTypes", t))
    w.save()
    val sqls = buildMergeSqls(destTable, stage, keys, increment.columns.toSeq,
      dialect)
    withConnection(url, options) { conn =>
      val autoCommit = conn.getAutoCommit
      conn.setAutoCommit(false)
      try {
        val st = conn.createStatement()
        try sqls.foreach(st.executeUpdate) finally st.close()
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally conn.setAutoCommit(autoCommit)
      // staging cleanup is best-effort outside the merge transaction
      // (DDL commits implicitly on several backends)
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE ${qTable(stage)}")
      catch { case _: java.sql.SQLException => () }
      finally st.close()
    }
  }

  /** Incremental-sync composite landing on a JDBC destination: watermark
    * from the destination (one `MAX` scalar over JDBC), strict-`>`
    * increment from the source (see [[IncrementalSync.increment]]), in-DB
    * merge. Mirrors sync_db_2_db's destination half (fast_etl.py:560-610).
    */
  def syncToJdbc(
      source: DataFrame,
      url: String,
      destTable: String,
      keys: Seq[String],
      dateColumn: String,
      dialect: Dialect = AnsiMerge,
      inclusive: Boolean = false,
      options: Map[String, String] = Map.empty): Unit = {
    val spark = source.sparkSession
    var reader = spark.read.format("jdbc").option("url", url)
      .option("query",
        s"SELECT MAX(${q(dateColumn)}) AS wm FROM ${qTable(destTable)}")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val row = reader.load().head()
    require(!row.isNullAt(0),
      "Destination table is empty — full load required before incremental " +
      "sync (reference contract, fast_etl.py:554-555)")
    val inc = IncrementalSync.increment(source, dateColumn, row.get(0),
      inclusive)
    merge(inc, url, destTable, keys, dialect, options = options)
  }
}
