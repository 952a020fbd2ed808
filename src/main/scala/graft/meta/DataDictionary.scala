package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.core.DataPackage

/** Data-dictionary generation — odf_tables.py:384-488 + the
  * datapackage_to_datadictionary operator: each resource renders as a
  * (field name, type, description) table. The document container (ODT)
  * is presentation; the engine-side artifact is the dictionary relation
  * itself, built from `df.schema` + column comments (CommentSync).
  */
object DataDictionary {

  final case class Entry(
      resource: String, field: String, `type`: String, description: String)

  def entries(resource: String, schema: StructType): Seq[Entry] =
    schema.fields.toIndexedSeq.map { f =>
      Entry(resource, f.name,
        DataPackage.frictionlessType(f.dataType),
        f.getComment().getOrElse(""))
    }

  /** Dictionary as a DataFrame (joinable/exportable like any table). */
  def toDf(spark: SparkSession, resource: String, schema: StructType): DataFrame = {
    import spark.implicits._
    entries(resource, schema).toDF()
  }

  /** Markdown render (the ODT table's content, container-agnostic). */
  def toMarkdown(resource: String, schema: StructType): String = {
    val rows = entries(resource, schema).map(e =>
      s"| ${e.field} | ${e.`type`} | ${e.description} |")
    (s"## $resource" +: "| field | type | description |" :: "|---|---|---|" ::
      rows.toList).mkString("\n")
  }
}
