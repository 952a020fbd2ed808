package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.core.DataPackage

/** Data-dictionary generation — odf_tables.py:384-488 + the
  * datapackage_to_datadictionary operator: each resource renders as a
  * (field name, type, description) table. The engine-side artifact is
  * the dictionary relation itself, built from `df.schema` + column
  * comments (CommentSync); `toOdt` renders the reference's ODT document
  * (title heading, description, per-resource level-3 heading +
  * description + named table with localized header row), via
  * [[OdtDocument]]. Template fill (`OdtDocument.fillTemplate`) covers
  * create_data_dictionary_from_template.
  */
object DataDictionary {

  final case class Entry(
      resource: String, field: String, `type`: String, description: String)

  /** Localized dictionary-table headers (DATA_DICT_COLUMN_NAMES,
    * odf_tables.py:14-17). */
  val ColumnNames: Map[String, Seq[String]] = Map(
    "en" -> Seq("field name", "type", "description"),
    "pt" -> Seq("nome do campo", "tipo", "descrição"))

  /** One dictionary resource: the table name plus optional presentation
    * title/description (resource.title / resource.description). */
  final case class Resource(
      name: String, schema: StructType,
      title: Option[String] = None, description: Option[String] = None)

  /** Render the full data-dictionary document to `path` as .odt —
    * create_data_dictionary (odf_tables.py:385-421). */
  def toOdt(path: String, resources: Seq[Resource],
      title: Option[String] = None, description: Option[String] = None,
      lang: String = "en"): Unit = {
    val headers = ColumnNames.getOrElse(lang,
      sys.error(s"unsupported data-dictionary language: $lang"))
    val b = OdtDocument.builder()
    title.foreach(t => b.heading(t, level = 1))
    description.foreach(b.paragraph)
    resources.foreach { r =>
      b.table(r.name, headers, title = r.title, description = r.description)
      b.addRows(r.name, entries(r.name, r.schema)
        .map(e => Seq(e.field, e.`type`, e.description)))
    }
    b.save(path)
  }

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
