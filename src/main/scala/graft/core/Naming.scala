package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Column-name canonicalization.
  *
  * Mirrors the reference's slugify + case-insensitive destination-driven
  * projection (fastetl/custom_functions/utils/string_formatting.py:13-28,
  * fast_etl.py:84-89, 290-309) as pure metadata operations on the driver —
  * these touch column *names*, never data, so they cost nothing at scale.
  */
object Naming {

  private val accentMap: Map[Char, Char] =
    ("áàâãäåéèêëíìîïóòôõöúùûüçñýÿ".zip("aaaaaaeeeeiiiiooooouuuucnyy") ++
     "ÁÀÂÃÄÅÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ".zip("aaaaaaeeeeiiiiooooouuuucny")).toMap

  /** Unaccent + lowercase + non-alphanumerics to single underscores.
    * Reference: slugify_column_names (string_formatting.py:13-28). */
  def slugify(name: String): String = {
    val unaccented = name.map(c => accentMap.getOrElse(c, c))
    unaccented.toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
  }

  /** Rename all columns of a DataFrame through slugify (spreadsheet-style
    * header canonicalization, gsheet_hook.py:148-151). */
  def slugifyColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(slugify).toIndexedSeq: _*)

  /** Case-insensitive resolution of destination column names against the
    * source DataFrame; returns the projection columns aliased to the
    * destination's spelling. Destination columns missing from the source
    * are skipped (the reference copies only the intersection,
    * fast_etl.py:84-89). An optional ignore list is applied the way
    * get_table_cols_name.py:22-24 does.
    */
  def resolveProjection(
      df: DataFrame,
      destColumns: Seq[String],
      columnsToIgnore: Seq[String] = Nil): Seq[Column] = {
    val ignore = columnsToIgnore.map(_.toLowerCase).toSet
    val bySrcLower = df.columns.map(c => c.toLowerCase -> c).toMap
    destColumns
      .filterNot(c => ignore.contains(c.toLowerCase))
      .flatMap(dest => bySrcLower.get(dest.toLowerCase)
        .map(src => col(src).alias(dest)))
  }
}
