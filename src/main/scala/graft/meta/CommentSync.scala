package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Table/column comment replication — the reference's TableComments
  * (utils/table_comments.py:25-488) reads comments from the source
  * catalog and re-applies them at the destination.
  *
  * In-engine, comments live on `StructField` metadata (`comment` key);
  * catalog emission is `COMMENT ON`/`ALTER TABLE ... COMMENT` SQL from
  * the same map (driver-side, not a data op).
  */
object CommentSync {

  /** Extract (column -> comment) from a schema. */
  def comments(schema: StructType): Map[String, String] =
    schema.fields.flatMap(f =>
      f.getComment().map(c => f.name -> c)).toMap

  /** Apply (column -> comment) onto a DataFrame's schema,
    * case-insensitively, keeping data untouched. */
  def applyComments(df: DataFrame, comments: Map[String, String]): DataFrame = {
    val byLower = comments.map { case (k, v) => k.toLowerCase -> v }
    val newSchema = StructType(df.schema.fields.map { f =>
      byLower.get(f.name.toLowerCase) match {
        case Some(c) => f.withComment(c)
        case None => f
      }
    })
    df.sparkSession.createDataFrame(df.rdd, newSchema)
  }

  /** Copy all column comments from `source` onto `dest` (K11 semantics:
    * only columns present at the destination receive comments). */
  def sync(source: DataFrame, dest: DataFrame): DataFrame =
    applyComments(dest, comments(source.schema))

  /** Dialect-neutral COMMENT statements for catalog push. */
  def commentDdl(schemaName: String, table: String,
      comments: Map[String, String]): Seq[String] =
    comments.toSeq.sortBy(_._1).map { case (col, c) =>
      s"COMMENT ON COLUMN $schemaName.$table.$col IS '${c.replace("'", "''")}'"
    }
}
