package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** SQL -> CSV extract — DbToCSVOperator (db_to_csv_operator.py:74-109):
  * optional column removal, nullable-int casts (""/null-safe), character
  * stripping across all string columns, then a headered CSV write.
  */
object CsvExtract {

  /** The reference's pandas `Int64` coercion: empty string -> null, then
    * long (db_to_csv_operator.py:86-88, patchwork.py:1094-1100). */
  def nullableIntCast(c: Column): Column =
    when(trim(c.cast(StringType)) === "", lit(null)).otherwise(c).cast("long")

  /** Strip a set of characters from every string column
    * (db_to_csv_operator.py:91-94). */
  def stripChars(df: DataFrame, chars: String): DataFrame = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSet
    df.select(df.columns.map { c =>
      if (stringCols(c)) translate(col(c), chars, "").as(c) else col(c)
    }.toIndexedSeq: _*)
  }

  /** Full transform: drop columns, cast int columns, strip characters. */
  def prepare(
      df: DataFrame,
      columnsToRemove: Seq[String] = Nil,
      intColumns: Seq[String] = Nil,
      charactersToRemove: String = ""): DataFrame = {
    val dropped = if (columnsToRemove.nonEmpty) df.drop(columnsToRemove: _*) else df
    val casted = intColumns.foldLeft(dropped)((d, c) =>
      d.withColumn(c, nullableIntCast(col(c))))
    if (charactersToRemove.nonEmpty) stripChars(casted, charactersToRemove)
    else casted
  }

  def write(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    var w = df.write.mode("overwrite").option("header", true)
    compression.foreach(c => w = w.option("compression", c))
    w.csv(path)
  }
}
