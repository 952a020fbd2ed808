package graft.meta

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.JdbcComments._

/** K11 catalog round-trip: live read/write against embedded Derby via the
  * portable SideTable dialect, and SQL-shape checks for the MSSQL /
  * Postgres / Teiid dialects against the reference's statements
  * (table_comments.py:65-202, 314-417). */
class JdbcCommentsSpec extends AnyFunSuite {

  private val url = "jdbc:derby:memory:commentsdb;create=true"

  private val sample = TableCommentSet(
    tableComment = Some("Orders fact table"),
    columnComments = Map(
      "o_orderkey" -> "Primary key",
      "o_comment" -> "Free text; quotes like 'this' must survive"))

  test("SideTable dialect round-trips comments on live Derby") {
    val conn = DriverManager.getConnection(url)
    try {
      SideTable.write(conn, "dbo", "orders", sample)
      val back = SideTable.read(conn, "", "dbo", "orders")
      assert(back == sample)

      // overwrite replaces, not appends (delete-then-insert)
      val updated = sample.copy(tableComment = Some("v2"))
      SideTable.write(conn, "dbo", "orders", updated)
      assert(SideTable.read(conn, "", "dbo", "orders") == updated)

      // isolation by (schema, table)
      assert(SideTable.read(conn, "", "dbo", "other") ==
        TableCommentSet(None, Map.empty))
    } finally conn.close()
  }

  test("replicate copies source comments to a destination catalog") {
    val srcUrl = "jdbc:derby:memory:commentsrc;create=true"
    val dstUrl = "jdbc:derby:memory:commentdst;create=true"
    val c1 = DriverManager.getConnection(srcUrl)
    try SideTable.write(c1, "stage", "customer", sample) finally c1.close()

    val copied = JdbcComments.replicate(
      srcUrl, "sidetable", "", "stage", "customer",
      dstUrl, "generic", "public", "customer")
    assert(copied == sample)

    val c2 = DriverManager.getConnection(dstUrl)
    try assert(SideTable.read(c2, "", "public", "customer") == sample)
    finally c2.close()
  }

  test("MSSQL read SQL matches fn_listextendedproperty shape") {
    val Seq(t, c) = MsSql.readSqls("db", "dbo", "orders")
    assert(t.contains("fn_listextendedproperty"))
    assert(t.contains("'MS_DESCRIPTION', 'schema', 'dbo', 'table', 'orders', default, default"))
    assert(c.contains("'COLUMN', default"))
  }

  test("MSSQL write picks add vs update per existence probe") {
    val existing = TableCommentSet(Some("old"), Map("o_orderkey" -> "old"))
    val sqls = MsSql.writeSqls("dbo", "orders", sample, existing)
    // table + o_orderkey existed -> update; o_comment new -> add
    assert(sqls.count(_.contains("sp_updateextendedproperty")) == 2)
    assert(sqls.count(_.contains("sp_addextendedproperty")) == 1)
    val add = sqls.find(_.contains("sp_addextendedproperty")).get
    assert(add.contains("@level2type='column', @level2name='o_comment'"))
    // single-quote escaping in values
    assert(add.contains("quotes like ''this'' must survive"))
    val tableStmt = sqls.head
    assert(tableStmt.contains("@level1name='orders'") &&
      !tableStmt.contains("@level2type"))
  }

  test("MSSQL write emits the exact extendedproperty statements") {
    // exact-text pins for both procedure variants (add for new, update
    // for pre-existing) — table_comments.py:163-213's emission, so a
    // parameter rename or level reshuffle fails loudly, not by substring
    val sqls = MsSql.writeSqls("dbo", "orders", sample,
      TableCommentSet(Some("old"), Map.empty))
    assert(sqls == Seq(
      "EXEC sys.sp_updateextendedproperty @name='MS_Description'," +
        " @value='Orders fact table', @level0type='schema'," +
        " @level0name='dbo', @level1type='table', @level1name='orders'",
      "EXEC sys.sp_addextendedproperty @name='MS_Description'," +
        " @value='Free text; quotes like ''this'' must survive'," +
        " @level0type='schema', @level0name='dbo'," +
        " @level1type='table', @level1name='orders'," +
        " @level2type='column', @level2name='o_comment'",
      "EXEC sys.sp_addextendedproperty @name='MS_Description'," +
        " @value='Primary key', @level0type='schema', @level0name='dbo'," +
        " @level1type='table', @level1name='orders'," +
        " @level2type='column', @level2name='o_orderkey'"))
  }

  test("Postgres write emits the exact COMMENT ON statements") {
    val sqls = Postgres.writeSqls("public", "orders", sample,
      TableCommentSet(None, Map.empty))
    assert(sqls == Seq(
      """COMMENT ON TABLE "public"."orders" IS 'Orders fact table'""",
      "COMMENT ON COLUMN \"public\".\"orders\".\"o_comment\"" +
        " IS 'Free text; quotes like ''this'' must survive'",
      "COMMENT ON COLUMN \"public\".\"orders\".\"o_orderkey\"" +
        " IS 'Primary key'"))
  }

  test("Postgres write emits COMMENT ON, read queries pg_catalog") {
    val sqls = Postgres.writeSqls("public", "orders", sample,
      TableCommentSet(None, Map.empty))
    assert(sqls.head ==
      """COMMENT ON TABLE "public"."orders" IS 'Orders fact table'""")
    assert(sqls.exists(_.startsWith(
      """COMMENT ON COLUMN "public"."orders"."o_orderkey"""")))
    val Seq(t, c) = Postgres.readSqls("db", "public", "orders")
    assert(t.contains("obj_description") && c.contains("col_description"))
  }

  test("Postgres identifiers with embedded quotes cannot break out") {
    val sqls = Postgres.writeSqls("""pu"blic""", """ord"; DROP TABLE x; --""",
      TableCommentSet(Some("c"), Map("""co"l""" -> "d")),
      TableCommentSet(None, Map.empty))
    // every identifier is quoted with embedded double quotes doubled, so
    // the hostile table name stays one identifier token
    assert(sqls.head ==
      "COMMENT ON TABLE \"pu\"\"blic\".\"ord\"\"; DROP TABLE x; --\" IS 'c'")
    assert(sqls(1) ==
      "COMMENT ON COLUMN \"pu\"\"blic\".\"ord\"\"; DROP TABLE x; --\".\"co\"\"l\" IS 'd'")
  }

  test("Teiid reads SYS.Tables/SYS.Columns and refuses writes") {
    val Seq(t, c) = Teiid.readSqls("vdb1", "stage", "orders")
    assert(t.contains("FROM SYS.Tables") && t.contains("VDBName = 'vdb1'"))
    assert(c.contains("FROM SYS.Columns") && c.contains("TableName = 'orders'"))
    intercept[NotImplementedError] {
      Teiid.writeSqls("s", "t", sample, TableCommentSet(None, Map.empty))
    }
  }

  test("dialect dispatch mirrors the reference's provider map") {
    assert(dialectFor("mssql") == MsSql)
    assert(dialectFor("postgres") == Postgres)
    assert(dialectFor("teiid") == Teiid)
    assert(dialectFor("derby") == SideTable)
    intercept[NotImplementedError] { dialectFor("oracle") }
  }

  test("TableCommentSet.rows matches the reference frame shape") {
    assert(sample.rows("orders") == Seq(
      ("table", "orders", "Orders fact table"),
      ("column", "o_comment", "Free text; quotes like 'this' must survive"),
      ("column", "o_orderkey", "Primary key")))
  }
}
