package graft.core

import org.apache.spark.sql.types._

/** Cross-dialect type mapping — the reference's declarative matrix
  * (fastetl/custom_functions/utils/config/types_mapping.yml:1-125, applied
  * by _convert_datatypes at create_table.py:97-144) re-expressed as
  * Spark `DataType` <-> dialect DDL mappings.
  *
  * Used when writing back to an external RDBMS: the JDBC writer's
  * `createTableColumnTypes` option takes the synthesized column list, and
  * `ddl` emits the guarded CREATE TABLE the reference builds at
  * create_table.py:51-94.
  */
object TypeMapper {

  sealed trait Dialect { def name: String }
  case object Postgres extends Dialect { val name = "postgres" }
  case object MsSql extends Dialect { val name = "mssql" }
  case object MySql extends Dialect { val name = "mysql" }

  /** Source-side type name (Teiid/SQL spelling) -> Spark type.
    * Mirrors types_mapping.yml's source rows + §1.3 of SURVEY.md. */
  def toSpark(
      typeName: String,
      length: Option[Int] = None,
      precision: Option[Int] = None,
      scale: Option[Int] = None): DataType =
    typeName.toLowerCase match {
      case "string" | "varchar" | "char" | "text" | "clob" => StringType
      case "integer" | "int" | "serial" => IntegerType
      case "short" | "smallint" | "byte" | "tinyint" => ShortType
      case "long" | "biginteger" | "bigint" => LongType
      case "boolean" | "bit" | "bool" => BooleanType
      case "float" | "real" => FloatType
      case "double" | "float8" => DoubleType
      case "decimal" | "bigdecimal" | "numeric" =>
        // Cap (38,8) like the reference (types_mapping.yml decimal rows);
        // additionally clamp to a VALID Spark decimal (precision >= 1,
        // scale in [0, precision]) — source catalogs do report degenerate
        // (0, s) shapes.
        val p = math.max(1, math.min(precision.getOrElse(38), 38))
        val s = math.max(0, math.min(math.min(scale.getOrElse(8), 8), p))
        DecimalType(p, s)
      case "timestamp" | "datetime" | "datetime2" => TimestampType
      case "date" => DateType
      case "object" | "xml" | "blob" | "varbinary" | "bytea" => BinaryType
      case other =>
        throw new IllegalArgumentException(s"Unmapped source type: $other")
    }

  /** Spark type -> destination dialect DDL type (the matrix's dest rows).
    * String lengths over the dialect cap degrade to the unbounded form
    * (4000 -> 65535/TEXT on postgres, 4000 -> VARCHAR(MAX) on mssql —
    * types_mapping.yml string rows). */
  def toDdl(dt: DataType, dialect: Dialect, length: Option[Int] = None,
      fixedLength: Boolean = false): String = (dt, dialect) match {
    case (StringType, Postgres) =>
      length match {
        case Some(n) if n > 4000 => "TEXT"
        case Some(n) => s"${if (fixedLength) "CHAR" else "VARCHAR"}($n)"
        case None => "TEXT"
      }
    case (StringType, MsSql) =>
      length match {
        case Some(n) if n > 4000 => "VARCHAR(MAX)"
        case Some(n) => s"${if (fixedLength) "CHAR" else "VARCHAR"}($n)"
        case None => "VARCHAR(MAX)"
      }
    case (StringType, MySql) =>
      length.filter(_ <= 4000).map(n => s"VARCHAR($n)").getOrElse("TEXT")
    case (IntegerType, _) => "INT"
    case (ShortType, _) => "SMALLINT"
    case (LongType, _) => "BIGINT"
    case (BooleanType, Postgres) => "BOOLEAN"
    case (BooleanType, MsSql) => "BIT"
    case (BooleanType, MySql) => "BOOLEAN"
    case (FloatType | DoubleType, Postgres) => "FLOAT8"
    case (FloatType | DoubleType, MsSql) => "FLOAT"
    case (FloatType | DoubleType, MySql) => "DOUBLE"
    case (d: DecimalType, Postgres) => s"DECIMAL(${d.precision}, ${d.scale})"
    case (d: DecimalType, MsSql) => s"NUMERIC(${d.precision}, ${d.scale})"
    case (d: DecimalType, MySql) => s"DECIMAL(${d.precision}, ${d.scale})"
    case (TimestampType, Postgres) => "TIMESTAMP"
    case (TimestampType, MsSql) => "DATETIME2"     // create_table.py DATETIME->DATETIME2
    case (TimestampType, MySql) => "DATETIME"
    case (DateType, _) => "DATE"
    case (BinaryType, Postgres) => "BYTEA"
    case (BinaryType, MsSql) => "VARBINARY(MAX)"
    case (BinaryType, MySql) => "BLOB"
    case (other, d) =>
      throw new IllegalArgumentException(s"Unmapped dest type $other for ${d.name}")
  }

  /** `createTableColumnTypes`-style column list for a whole schema. */
  def columnTypes(schema: StructType, dialect: Dialect): String =
    schema.fields.map(f => s"${f.name} ${toDdl(f.dataType, dialect)}")
      .mkString(", ")

  /** Guarded CREATE TABLE, dialect-appropriate (create_table.py:51-94:
    * postgres/mysql use IF NOT EXISTS; mssql uses IF OBJECT_ID guard). */
  def ddl(schema: StructType, dialect: Dialect, schemaName: String,
      table: String): String = {
    val cols = schema.fields
      .map(f => s"  ${f.name} ${toDdl(f.dataType, dialect)}")
      .mkString(",\n")
    val qualified = s"$schemaName.$table"
    dialect match {
      case MsSql =>
        s"IF OBJECT_ID('$qualified', 'U') IS NULL CREATE TABLE $qualified (\n$cols\n)"
      case _ =>
        s"CREATE TABLE IF NOT EXISTS $qualified (\n$cols\n)"
    }
  }
}
