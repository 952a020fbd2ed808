package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Table-driven checks over the type matrix (types_mapping.yml semantics,
  * FIXTURES.md A4). */
class TypeMapperSpec extends AnyFunSuite {
  import TypeMapper._

  test("source types map to Spark types") {
    assert(toSpark("string") == StringType)
    assert(toSpark("integer") == IntegerType)
    assert(toSpark("short") == ShortType)
    assert(toSpark("long") == LongType)
    assert(toSpark("biginteger") == LongType)
    assert(toSpark("boolean") == BooleanType)
    assert(toSpark("float") == FloatType)
    assert(toSpark("double") == DoubleType)
    assert(toSpark("timestamp") == TimestampType)
    assert(toSpark("date") == DateType)
    assert(toSpark("object") == BinaryType)
    assert(toSpark("xml") == BinaryType)
  }

  test("decimal precision/scale are capped at (38,8) like the reference") {
    assert(toSpark("decimal", precision = Some(50), scale = Some(20)) ==
      DecimalType(38, 8))
    assert(toSpark("bigdecimal", precision = Some(10), scale = Some(2)) ==
      DecimalType(10, 2))
  }

  test("string length degradation: over 4000 goes unbounded per dialect") {
    assert(toDdl(StringType, Postgres, Some(10)) == "VARCHAR(10)")
    assert(toDdl(StringType, Postgres, Some(5000)) == "TEXT")
    assert(toDdl(StringType, MsSql, Some(5000)) == "VARCHAR(MAX)")
    assert(toDdl(StringType, MsSql, Some(10), fixedLength = true) == "CHAR(10)")
  }

  test("dialect-specific scalar mappings") {
    assert(toDdl(BooleanType, Postgres) == "BOOLEAN")
    assert(toDdl(BooleanType, MsSql) == "BIT")
    assert(toDdl(DoubleType, Postgres) == "FLOAT8")
    assert(toDdl(DoubleType, MsSql) == "FLOAT")
    assert(toDdl(TimestampType, MsSql) == "DATETIME2")
    assert(toDdl(DecimalType(38, 13), MsSql) == "NUMERIC(38, 13)")
    assert(toDdl(BinaryType, Postgres) == "BYTEA")
  }

  test("guarded DDL per dialect") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val pg = ddl(schema, Postgres, "sch", "tbl")
    assert(pg.startsWith("CREATE TABLE IF NOT EXISTS sch.tbl"))
    val ms = ddl(schema, MsSql, "sch", "tbl")
    assert(ms.startsWith("IF OBJECT_ID('sch.tbl', 'U') IS NULL CREATE TABLE"))
    assert(ms.contains("name VARCHAR(MAX)"))
  }

  test("exact emitted DDL — postgres branch (auto-create arm)") {
    // the reference's 8-way {pg,mssql}^2 x {pre-exist,auto-create} matrix
    // (tests/test_db_to_db_operator.py:123-199): the auto-create arm is
    // this emission, pinned to the exact text so a mapping or guard
    // regression cannot hide behind a substring assertion
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DecimalType(18, 2)),
      StructField("active", BooleanType),
      StructField("created", TimestampType)))
    assert(ddl(schema, Postgres, "stage", "orders") ==
      """CREATE TABLE IF NOT EXISTS stage.orders (
        |  id BIGINT,
        |  name TEXT,
        |  price DECIMAL(18, 2),
        |  active BOOLEAN,
        |  created TIMESTAMP
        |)""".stripMargin)
  }

  test("exact emitted DDL — mssql branch (auto-create arm)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DecimalType(18, 2)),
      StructField("active", BooleanType),
      StructField("created", TimestampType)))
    assert(ddl(schema, MsSql, "stage", "orders") ==
      """IF OBJECT_ID('stage.orders', 'U') IS NULL CREATE TABLE stage.orders (
        |  id BIGINT,
        |  name VARCHAR(MAX),
        |  price NUMERIC(18, 2),
        |  active BIT,
        |  created DATETIME2
        |)""".stripMargin)
  }

  test("columnTypes emits a createTableColumnTypes list") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("active", BooleanType)))
    assert(columnTypes(schema, MsSql) == "id BIGINT, active BIT")
  }
}
