package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Frictionless data-package support — the reference's zipped-CSV carrier
  * (patchwork.py:110-181): a CSV plus a `datapackage.json` describing
  * field names/types and primary keys. The zip envelope is a fetch-layer
  * concern; this module owns the schema descriptor <-> StructType mapping
  * (F11D_TO_PANDAS analog, patchwork.py:34-36) and the typed read/write.
  */
object DataPackage {

  /** Frictionless field type for a Spark type (write direction). */
  def frictionlessType(dt: DataType): String = dt match {
    case StringType => "string"
    case IntegerType | LongType | ShortType => "integer"
    case FloatType | DoubleType | _: DecimalType => "number"
    case BooleanType => "boolean"
    case TimestampType => "datetime"
    case DateType => "date"
    case _ => "any"
  }

  /** Spark type for a Frictionless field type (read direction; integers
    * become nullable LongType like pandas' Int64 in the reference). */
  def sparkType(frictionless: String): DataType = frictionless match {
    case "string" | "any" => StringType
    case "integer" | "year" => LongType
    case "number" => DoubleType
    case "boolean" => BooleanType
    case "datetime" => TimestampType
    case "date" => DateType
    case other =>
      throw new IllegalArgumentException(s"Unmapped frictionless type: $other")
  }

  /** Minimal descriptor JSON for one resource (name, fields, primaryKey)
    * — enough for the reference's round trip (patchwork.py:126-147). */
  def descriptorJson(name: String, schema: StructType,
      primaryKeys: Seq[String]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val fields = schema.fields.map(f =>
      s"{${q("name")}: ${q(f.name)}, ${q("type")}: ${q(frictionlessType(f.dataType))}}")
      .mkString("[", ", ", "]")
    val pk = primaryKeys.map(q).mkString("[", ", ", "]")
    s"""{${q("name")}: ${q(name)}, ${q("resources")}: [{${q("name")}: ${q(name)}, ${q("schema")}: {${q("fields")}: $fields, ${q("primaryKey")}: $pk}}]}"""
  }

  /** StructType from parsed descriptor fields (name -> type pairs). */
  def schemaFromFields(fields: Seq[(String, String)]): StructType =
    StructType(fields.map { case (n, t) => StructField(n, sparkType(t)) })

  /** Write df as CSV + sidecar descriptor (the zip of the two files is a
    * post-process on the driver, as in the reference). */
  def write(df: DataFrame, path: String, name: String,
      primaryKeys: Seq[String]): Unit = {
    df.write.mode("overwrite").option("header", true).csv(s"$path/$name.csv")
    val json = descriptorJson(name, df.schema, primaryKeys)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/datapackage.json"), json)
  }

  /** Read a data-package CSV with the descriptor's typed schema (no
    * inference — types come from the package like the reference's dtype
    * restoration). */
  def read(spark: SparkSession, path: String, name: String,
      fields: Seq[(String, String)]): DataFrame =
    spark.read
      .option("header", true)
      .schema(schemaFromFields(fields))
      .csv(s"$path/$name.csv")

  /** Zip envelope (K5, patchwork.py:153-181): bundle the CSV part files
    * and descriptor into one `<name>.zip` on the driver — the reference's
    * transport format for patch/QA files. */
  def zip(path: String, name: String): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    import scala.jdk.CollectionConverters._
    val target = Paths.get(s"$path/$name.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(target))
    try {
      val csvDir = Paths.get(s"$path/$name.csv")
      val parts = Files.list(csvDir).iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".csv")).sortBy(_.toString)
      parts.zipWithIndex.foreach { case (p, i) =>
        val suffix = if (parts.length == 1) "" else s"_$i"
        zos.putNextEntry(new ZipEntry(s"$name$suffix.csv"))
        Files.copy(p, zos)
        zos.closeEntry()
      }
      zos.putNextEntry(new ZipEntry("datapackage.json"))
      Files.copy(Paths.get(s"$path/datapackage.json"), zos)
      zos.closeEntry()
    } finally zos.close()
    target
  }
}
