package graft.meta

import java.sql.{Connection, DriverManager, ResultSet}

/** Table/column comment replication against a live JDBC catalog — the
  * reference's TableComments getter/putter dispatch
  * (utils/table_comments.py:419-482): read comments from a source
  * database by provider type, write them to a destination database by
  * provider type. Complements [[CommentSync]], which carries comments
  * in-engine on StructField metadata.
  *
  * Provider dialects mirror the reference exactly:
  *  - MSSQL: `fn_listextendedproperty` reader (table_comments.py:65-106),
  *    `sp_addextendedproperty` / `sp_updateextendedproperty` writer with
  *    per-entity existence probe (table_comments.py:203-268, 314-375).
  *  - Postgres: catalog reader via `obj_description`/`col_description`
  *    (the reference delegates to SQLAlchemy inspection,
  *    table_comments.py:108-160), `COMMENT ON` writer (the reference
  *    delegates to Alembic ops, table_comments.py:377-417).
  *  - Teiid: read-only `SYS.Tables`/`SYS.Columns` (table_comments.py:162-202);
  *    the reference raises NotImplementedError on write, as do we.
  *  - SideTable: a portable fallback that keeps comments in a
  *    `graft_table_comments` catalog table — executable on any JDBC
  *    backend (incl. embedded Derby, which has no native comment DDL);
  *    this is the live-testable path.
  *
  * Everything here is driver-side catalog metadata (a handful of rows);
  * no Spark job is involved, matching the reference's hook-based design.
  */
object JdbcComments {

  /** The reference's table_comments frame (database_level, name, comment)
    * as a typed pair: table-level comment + per-column comments. */
  case class TableCommentSet(
      tableComment: Option[String],
      columnComments: Map[String, String]) {

    /** Reference-shape rows: (database_level, name, comment). */
    def rows(table: String): Seq[(String, String, String)] =
      tableComment.map(c => ("table", table, c)).toSeq ++
        columnComments.toSeq.sortBy(_._1).map { case (n, c) => ("column", n, c) }
  }

  private def esc(s: String): String = s.replace("'", "''")

  /** Quoted identifier with embedded double quotes doubled — a schema,
    * table, or column name must not be able to break out of the quoted
    * position it is interpolated into (COMMENT ON takes identifiers, not
    * string literals, so [[esc]] does not apply there). */
  private def qid(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  /** A provider dialect: how to read and write comments on one backend. */
  sealed trait Dialect {
    /** Queries whose results feed [[read]]; exposed for SQL-level tests. */
    def readSqls(database: String, schema: String, table: String): Seq[String]
    /** Statements that [[write]] would run (existence-probe outcomes
      * pre-decided by `existing`); exposed for SQL-level tests. */
    def writeSqls(schema: String, table: String, comments: TableCommentSet,
        existing: TableCommentSet): Seq[String]

    def read(conn: Connection, database: String, schema: String,
        table: String): TableCommentSet
    def write(conn: Connection, schema: String, table: String,
        comments: TableCommentSet): Unit
  }

  private def queryPairs(conn: Connection, sql: String): Seq[(String, String)] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      val buf = Seq.newBuilder[(String, String)]
      while (rs.next()) buf += ((rs.getString(1), rs.getString(2)))
      buf.result()
    } finally st.close()
  }

  private def run(conn: Connection, sqls: Seq[String]): Unit = {
    val st = conn.createStatement()
    try sqls.foreach(st.executeUpdate) finally st.close()
  }

  /** MSSQL extended properties (table_comments.py:65-106, 314-375). */
  case object MsSql extends Dialect {
    def readSqls(database: String, schema: String, table: String): Seq[String] =
      Seq("default", "'COLUMN'").map { queryParam =>
        s"SELECT objname, value FROM fn_listextendedproperty" +
          s" ('MS_DESCRIPTION', 'schema', '${esc(schema)}'," +
          s" 'table', '${esc(table)}', $queryParam, default)"
      }

    def writeSqls(schema: String, table: String, comments: TableCommentSet,
        existing: TableCommentSet): Seq[String] = {
      def proc(exists: Boolean): String =
        if (exists) "sp_updateextendedproperty" else "sp_addextendedproperty"
      val tableStmt = comments.tableComment.map { c =>
        s"EXEC sys.${proc(existing.tableComment.isDefined)}" +
          s" @name='MS_Description', @value='${esc(c)}'," +
          s" @level0type='schema', @level0name='${esc(schema)}'," +
          s" @level1type='table', @level1name='${esc(table)}'"
      }
      val colStmts = comments.columnComments.toSeq.sortBy(_._1).map {
        case (col, c) =>
          s"EXEC sys.${proc(existing.columnComments.contains(col))}" +
            s" @name='MS_Description', @value='${esc(c)}'," +
            s" @level0type='schema', @level0name='${esc(schema)}'," +
            s" @level1type='table', @level1name='${esc(table)}'," +
            s" @level2type='column', @level2name='${esc(col)}'"
      }
      tableStmt.toSeq ++ colStmts
    }

    def read(conn: Connection, database: String, schema: String,
        table: String): TableCommentSet = {
      val Seq(tableSql, colSql) = readSqls(database, schema, table)
      val t = queryPairs(conn, tableSql).headOption.map(_._2)
      val cols = queryPairs(conn, colSql).filter(_._2 != null).toMap
      TableCommentSet(t, cols)
    }

    def write(conn: Connection, schema: String, table: String,
        comments: TableCommentSet): Unit = {
      val existing = read(conn, "", schema, table)
      run(conn, writeSqls(schema, table, comments, existing))
    }
  }

  /** Postgres catalog comments (table_comments.py:108-160, 377-417). */
  case object Postgres extends Dialect {
    def readSqls(database: String, schema: String, table: String): Seq[String] =
      Seq(
        s"SELECT c.relname, obj_description(c.oid) FROM pg_class c" +
          s" JOIN pg_namespace n ON n.oid = c.relnamespace" +
          s" WHERE n.nspname = '${esc(schema)}' AND c.relname = '${esc(table)}'",
        s"SELECT a.attname, col_description(a.attrelid, a.attnum)" +
          s" FROM pg_attribute a JOIN pg_class c ON c.oid = a.attrelid" +
          s" JOIN pg_namespace n ON n.oid = c.relnamespace" +
          s" WHERE n.nspname = '${esc(schema)}' AND c.relname = '${esc(table)}'" +
          s" AND a.attnum > 0 AND NOT a.attisdropped")

    def writeSqls(schema: String, table: String, comments: TableCommentSet,
        existing: TableCommentSet): Seq[String] = {
      // COMMENT ON is add-or-replace; no existence probe needed (the
      // reference's Alembic ops behave identically)
      val t = comments.tableComment.map(c =>
        s"COMMENT ON TABLE ${qid(schema)}.${qid(table)} IS '${esc(c)}'")
      val cols = comments.columnComments.toSeq.sortBy(_._1).map { case (n, c) =>
        s"COMMENT ON COLUMN ${qid(schema)}.${qid(table)}.${qid(n)} IS '${esc(c)}'"
      }
      t.toSeq ++ cols
    }

    def read(conn: Connection, database: String, schema: String,
        table: String): TableCommentSet = {
      val Seq(tableSql, colSql) = readSqls(database, schema, table)
      val t = queryPairs(conn, tableSql).headOption.flatMap(p => Option(p._2))
      val cols = queryPairs(conn, colSql).filter(_._2 != null).toMap
      TableCommentSet(t, cols)
    }

    def write(conn: Connection, schema: String, table: String,
        comments: TableCommentSet): Unit =
      run(conn, writeSqls(schema, table, comments,
        TableCommentSet(None, Map.empty)))
  }

  /** Teiid virtual-database catalog — read-only, like the reference
    * (table_comments.py:162-202; put dispatch has no teiid branch). */
  case object Teiid extends Dialect {
    def readSqls(database: String, schema: String, table: String): Seq[String] =
      Seq(
        s"SELECT Name, Description FROM SYS.Tables" +
          s" WHERE VDBName = '${esc(database)}'" +
          s" and SchemaName = '${esc(schema)}' and Name = '${esc(table)}'",
        s"SELECT Name, Description FROM SYS.Columns" +
          s" WHERE VDBName = '${esc(database)}'" +
          s" and SchemaName = '${esc(schema)}' and TableName = '${esc(table)}'")

    def writeSqls(schema: String, table: String, comments: TableCommentSet,
        existing: TableCommentSet): Seq[String] =
      throw new NotImplementedError(
        "Teiid is a read-only comment source (table_comments.py:471-482)")

    def read(conn: Connection, database: String, schema: String,
        table: String): TableCommentSet = {
      val Seq(tableSql, colSql) = readSqls(database, schema, table)
      val t = queryPairs(conn, tableSql).headOption.flatMap(p => Option(p._2))
      val cols = queryPairs(conn, colSql).filter(_._2 != null).toMap
      TableCommentSet(t, cols)
    }

    def write(conn: Connection, schema: String, table: String,
        comments: TableCommentSet): Unit =
      throw new NotImplementedError(
        "Teiid is a read-only comment source (table_comments.py:471-482)")
  }

  /** Portable side-table catalog: comments live in `graft_table_comments`
    * (schema_name, table_name, database_level, name, comment_text). Works
    * on any JDBC backend — the live-testable dialect for engines without
    * native comment DDL (embedded Derby in the spec harness). */
  case object SideTable extends Dialect {
    val catalogTable = "graft_table_comments"

    def ensureSql: String =
      s"CREATE TABLE $catalogTable (" +
        "schema_name VARCHAR(128) NOT NULL, " +
        "table_name VARCHAR(128) NOT NULL, " +
        "database_level VARCHAR(16) NOT NULL, " +
        "name VARCHAR(128) NOT NULL, " +
        "comment_text VARCHAR(4000))"

    private def ensure(conn: Connection): Unit = {
      val meta = conn.getMetaData
      // Derby folds unquoted DDL identifiers to uppercase
      val rs = meta.getTables(null, null, catalogTable.toUpperCase, null)
      val exists = try rs.next() finally rs.close()
      if (!exists) run(conn, Seq(ensureSql))
    }

    def readSqls(database: String, schema: String, table: String): Seq[String] =
      Seq("table", "column").map { level =>
        s"SELECT name, comment_text FROM $catalogTable" +
          s" WHERE schema_name = '${esc(schema)}'" +
          s" AND table_name = '${esc(table)}'" +
          s" AND database_level = '$level'"
      }

    def writeSqls(schema: String, table: String, comments: TableCommentSet,
        existing: TableCommentSet): Seq[String] = {
      val del = s"DELETE FROM $catalogTable WHERE" +
        s" schema_name = '${esc(schema)}' AND table_name = '${esc(table)}'"
      val ins = comments.rows(table).map { case (level, name, c) =>
        s"INSERT INTO $catalogTable VALUES ('${esc(schema)}'," +
          s" '${esc(table)}', '$level', '${esc(name)}', '${esc(c)}')"
      }
      del +: ins
    }

    def read(conn: Connection, database: String, schema: String,
        table: String): TableCommentSet = {
      ensure(conn)
      val Seq(tableSql, colSql) = readSqls(database, schema, table)
      val t = queryPairs(conn, tableSql).headOption.map(_._2)
      val cols = queryPairs(conn, colSql).filter(_._2 != null).toMap
      TableCommentSet(t, cols)
    }

    def write(conn: Connection, schema: String, table: String,
        comments: TableCommentSet): Unit = {
      ensure(conn)
      run(conn, writeSqls(schema, table, comments,
        TableCommentSet(None, Map.empty)))
    }
  }

  /** Provider-name dispatch, mirroring get_table_comments_df /
    * put_table_comments (table_comments.py:438-482). */
  def dialectFor(connType: String): Dialect = connType.toLowerCase match {
    case "mssql" => MsSql
    case "postgres" | "postgresql" => Postgres
    case "teiid" => Teiid
    case "sidetable" | "derby" | "generic" => SideTable
    case other => throw new NotImplementedError(
      s"Comment dialect for '$other' not implemented. PR for the best.")
  }

  private def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Read the source's comments, write them at the destination — the
    * reference's copy flow (TableComments(...).table_comments →
    * TableComments(dest).put_table_comments, table_comments.py:419-488). */
  def replicate(
      sourceUrl: String, sourceType: String, sourceDatabase: String,
      sourceSchema: String, sourceTable: String,
      destUrl: String, destType: String,
      destSchema: String, destTable: String): TableCommentSet = {
    val comments = withConnection(sourceUrl) { c =>
      dialectFor(sourceType).read(c, sourceDatabase, sourceSchema, sourceTable)
    }
    withConnection(destUrl) { c =>
      dialectFor(destType).write(c, destSchema, destTable, comments)
    }
    comments
  }
}
