package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.IO

/** In-DB merge against embedded Derby — the reference's staged
  * UPDATE+INSERT landing (fast_etl.py:601-610; round-trip pattern of the
  * reference's tests/test_db_to_db_operator.py:241-249). */
class JdbcMergeSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:mergedb;create=true"

  test("ANSI MERGE updates matched keys and inserts new ones") {
    val dest = Seq(
      (1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0))
      .toDF("id", "name", "score")
    IO.JdbcSink(url, "m_dest").write(dest, truncate = false)

    val inc = Seq(
      (2L, "TWO", 22.0),   // update
      (3L, "THREE", 33.0), // update
      (4L, "four", 40.0))  // insert
      .toDF("id", "name", "score")
    JdbcMerge.merge(inc, url, "m_dest", Seq("id"), JdbcMerge.AnsiMerge)

    val back = IO.JdbcSource(url, table = Some("m_dest")).read(spark)
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set(
      (1L, "one", 10.0), (2L, "TWO", 22.0), (3L, "THREE", 33.0),
      (4L, "four", 40.0)))
    // staging table dropped after the merge
    val tables = IO.JdbcSource(url, query = Some(
      "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'"))
      .read(spark).as[String].collect().toSet
    assert(!tables.exists(_.equalsIgnoreCase("m_dest_stage")))
  }

  test("in-DB merge result equals IncrementalSync.mergeBatch") {
    val dest = (1 to 50).map(i => (i.toLong, s"v$i", i * 1.0))
      .toDF("id", "v", "x")
    val inc = (40 to 60).map(i => (i.toLong, s"new$i", i * 2.0))
      .toDF("id", "v", "x")
    IO.JdbcSink(url, "m_equiv").write(dest, truncate = false)
    JdbcMerge.merge(inc, url, "m_equiv", Seq("id"))

    val inDb = IO.JdbcSource(url, table = Some("m_equiv")).read(spark)
      .as[(Long, String, Double)].collect().toSet
    val inSpark = IncrementalSync.mergeBatch(dest, inc, Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(inDb == inSpark)
  }

  test("composite keys merge on every key column") {
    val dest = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "x")
    val inc = Seq((1L, "b", 20.0), (2L, "a", 30.0)).toDF("k1", "k2", "x")
    // string join keys must not land as LOBs (Derby CLOB is not comparable
    // in a MERGE ON clause) — pin VARCHAR on both dest and stage
    val varchar = Map("createTableColumnTypes" -> "k2 VARCHAR(64)")
    IO.JdbcSink(url, "m_comp", options = varchar).write(dest, truncate = false)
    JdbcMerge.merge(inc, url, "m_comp", Seq("k1", "k2"),
      stageColumnTypes = Some("k2 VARCHAR(64)"))
    val back = IO.JdbcSource(url, table = Some("m_comp")).read(spark)
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "a", 1.0), (1L, "b", 20.0), (2L, "a", 30.0)))
  }

  test("syncToJdbc pulls past the destination watermark and merges") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val dest = Seq((1L, ts(1), "a"), (2L, ts(2), "b")).toDF("id", "ts", "v")
    IO.JdbcSink(url, "m_sync").write(dest, truncate = false)
    val source = Seq(
      (1L, ts(1), "a"),        // before watermark: not pulled
      (2L, ts(2), "b2"),       // AT watermark: strict > skips (bug-for-bug)
      (3L, ts(5), "c"))        // new
      .toDF("id", "ts", "v")
    JdbcMerge.syncToJdbc(source, url, "m_sync", Seq("id"), "ts")
    val back = IO.JdbcSource(url, table = Some("m_sync")).read(spark)
      .as[(Long, java.sql.Timestamp, String)].collect().toSet
    assert(back == Set((1L, ts(1), "a"), (2L, ts(2), "b"), (3L, ts(5), "c")))
  }

  test("syncToJdbc refuses an empty destination (reference contract)") {
    IO.JdbcSink(url, "m_empty").write(
      Seq.empty[(Long, java.sql.Timestamp, String)].toDF("id", "ts", "v"),
      truncate = false)
    val source = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      "a")).toDF("id", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      JdbcMerge.syncToJdbc(source, url, "m_empty", Seq("id"), "ts")
    }
    assert(e.getMessage.contains("full load required"))
  }

  test("UpdateFromInsert emits the reference's exact statement pair") {
    val sqls = JdbcMerge.buildMergeSqls("d.t", "d.t_inc", Seq("id"),
      Seq("id", "a", "b"), JdbcMerge.UpdateFromInsert)
    assert(sqls.length == 2)
    val Seq(upd, ins) = sqls
    assert(upd.startsWith("UPDATE d.t SET"))
    assert(upd.contains("\"a\" = orig.\"a\"") && upd.contains("FROM d.t_inc orig"))
    assert(upd.contains("orig.\"id\" = d.t.\"id\""))
    assert(ins.contains("WHERE NOT EXISTS"))
    assert(ins.contains("atual.\"id\" = inc.\"id\""))
    // key columns never appear in the UPDATE SET list
    assert(!upd.contains("\"id\" = orig"))
  }

  test("a table name carrying a double quote round-trips on Derby") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE "we""ird" ("id" BIGINT, "v" VARCHAR(20))""")
      st.executeUpdate("""INSERT INTO "we""ird" VALUES (1, 'one')""")
      st.executeUpdate("""INSERT INTO "we""ird" VALUES (2, 'two')""")
      st.close()
    } finally conn.close()
    // the stage is created by Spark's JDBC writer, which interpolates
    // dbtable verbatim — non-plain names are passed pre-quoted and our
    // merge SQL must use them untouched
    val inc = Seq((2L, "TWO"), (3L, "three")).toDF("id", "v")
    JdbcMerge.merge(inc, url, "we\"ird", Seq("id"),
      stageTable = Some("\"we\"\"ird_stage\""),
      stageColumnTypes = Some("v VARCHAR(20)"))
    val conn2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn2.createStatement()
        .executeQuery("""SELECT "id", "v" FROM "we""ird"""")
      val back = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getLong(1), r.getString(2))).toSet
      assert(back == Set((1L, "one"), (2L, "TWO"), (3L, "three")))
    } finally conn2.close()
  }

  test("generated SQL doubles embedded quotes in non-plain table names") {
    val Seq(m) = JdbcMerge.buildMergeSqls("we\"ird", "s.plain_stage",
      Seq("id"), Seq("id", "v"), JdbcMerge.AnsiMerge)
    assert(m.startsWith("MERGE INTO \"we\"\"ird\" d USING s.plain_stage s"))
  }

  test("a quote-delimited segment with stray interior quotes is re-quoted") {
    // starts and ends with `"` but the interior quotes are NOT doubled —
    // interpolated verbatim this would terminate the quoted region after
    // "x" and splice `d; DROP TABLE y; --` into the statement
    val hostile = "\"x\" d; DROP TABLE y; --\""
    val rendered = JdbcMerge.qTable(hostile)
    assert(rendered == "\"\"\"x\"\" d; DROP TABLE y; --\"\"\"")
    // strictly-quoted segments (interior quotes doubled) still pass verbatim
    assert(JdbcMerge.qTable("\"we\"\"ird\"") == "\"we\"\"ird\"")
    assert(JdbcMerge.qTable("s.\"my.table\"") == "s.\"my.table\"")
    // and the hostile name lands as ONE quoted identifier in the merge SQL
    val Seq(m) = JdbcMerge.buildMergeSqls(hostile, "plain_stage",
      Seq("id"), Seq("id", "v"), JdbcMerge.AnsiMerge)
    assert(m.startsWith("MERGE INTO " + rendered + " d USING plain_stage s"))
    assert(!m.contains("DROP TABLE y; --\" "))
  }

  test("default stage name is derived from the unquoted last segment") {
    assert(JdbcMerge.defaultStageName("m_dest") == "m_dest_stage")
    assert(JdbcMerge.defaultStageName("d.t") == "d.t_stage")
    assert(JdbcMerge.defaultStageName("\"we\"\"ird\"") == "\"we\"\"ird_stage\"")
    assert(JdbcMerge.defaultStageName("s.\"my.table\"") == "s.\"my.table_stage\"")
    assert(JdbcMerge.defaultStageName("we\"ird") == "\"we\"\"ird_stage\"")
  }

  test("merge with a pre-quoted destTable and no explicit stage round-trips") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE "od""d2" ("id" BIGINT, "v" VARCHAR(20))""")
      st.executeUpdate("""INSERT INTO "od""d2" VALUES (1, 'one')""")
      st.close()
    } finally conn.close()
    val inc = Seq((1L, "ONE"), (2L, "two")).toDF("id", "v")
    // no stageTable: the default must be a valid quoted identifier for
    // both the Spark JDBC writer (verbatim dbtable) and the merge SQL
    JdbcMerge.merge(inc, url, "\"od\"\"d2\"", Seq("id"),
      stageColumnTypes = Some("v VARCHAR(20)"))
    val conn2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn2.createStatement()
        .executeQuery("""SELECT "id", "v" FROM "od""d2"""")
      val back = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getLong(1), r.getString(2))).toSet
      assert(back == Set((1L, "ONE"), (2L, "two")))
    } finally conn2.close()
  }

  test("merge with key-only schema degrades to insert-missing") {
    val dest = Seq(Tuple1(1L), Tuple1(2L)).toDF("id")
    val inc = Seq(Tuple1(2L), Tuple1(3L)).toDF("id")
    IO.JdbcSink(url, "m_keys").write(dest, truncate = false)
    JdbcMerge.merge(inc, url, "m_keys", Seq("id"))
    val back = IO.JdbcSource(url, table = Some("m_keys")).read(spark)
      .as[Long].collect().toSet
    assert(back == Set(1L, 2L, 3L))
  }
}
