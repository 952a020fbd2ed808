package graft.clean

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CpfFunctions, GeoFunctions}

/** Concrete cleaners — each mirrors one reference cleaner from
  * patchwork.py (see SURVEY.md §2.10 for the rule-by-rule citations).
  * All rules are Column expressions; QA logs are relational projections.
  */

/** Drop PK-duplicate rows keeping the first under an explicit ordering
  * (patchwork.py:380-412). pandas' implicit file order is replaced by
  * `orderBy` — at scale, a deterministic tiebreak is mandatory. */
final case class DuplicatedRowCleaner(
    meta: TableMeta,
    orderBy: Seq[String],
    verifiedAt: Timestamp) extends Cleaner {

  def clean(df: DataFrame): CleanResult = {
    val w = Window.partitionBy(meta.primaryKeys.map(col): _*)
      .orderBy(orderBy.map(col): _*)
    val rn = df.withColumn("__rn", row_number().over(w))
    val cleaned = rn.filter(col("__rn") === 1).drop("__rn")
    val qa = Cleaner.dropLineQa(
      rn.filter(col("__rn") > 1).drop("__rn"),
      meta, "Registro duplicado", verifiedAt)
    CleanResult(cleaned, qa)
  }
}

/** Coordinate repair (patchwork.py:414-605): comma-decimal fix, misscale
  * fix, validity clamp, WKT synthesis. */
final case class GeoPointCleaner(
    meta: TableMeta,
    latColumn: String,
    lonColumn: String,
    verifiedAt: Timestamp,
    wktColumn: Option[String] = None) extends Cleaner {

  def clean(df: DataFrame): CleanResult = {
    // Materialize the cleaning pipeline once per coordinate in aliased
    // columns: the QA projection references each result ~5 times, and
    // inlining the full parse->misscale->clamp tree at every reference
    // produced codegen large enough to hurt (CollapseProject keeps this
    // boundary because the aliases are multiply-referenced and non-cheap).
    // Persisted: three consumers (cleaned output + two QA arms) would
    // otherwise each re-derive the pipeline, and predicate pushdown
    // substitutes the aliases back into the QA filters — producing an
    // expression tree large enough to overflow codegen's method limit
    // (observed: whole plan fell back to interpreted execution).
    val prep = df
      .withColumn("__lat_fixed", GeoFunctions.cleanLat(col(latColumn)))
      .withColumn("__lon_fixed", GeoFunctions.cleanLon(col(lonColumn)))
      .withColumn("__lat_plain", trim(col(latColumn)).cast("double"))
      .withColumn("__lon_plain", trim(col(lonColumn)).cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // A cell is QA-worthy when the value actually changed relative to a
    // plain numeric parse (comma fix / misscale / clamp) OR a non-empty
    // raw value was rejected to null (unparseable — both sides of the
    // plain-parse comparison are null there, so it needs its own arm;
    // reference logs it as CAST_NULL, patchwork.py:445-471).
    def changed(raw: Column, plain: Column, fixed: Column): Column =
      (raw.isNotNull && trim(raw) =!= "" && fixed.isNull) || !(plain <=> fixed)
    val qaLat = Cleaner.columnQa(prep, meta, latColumn,
      col(latColumn).cast("string"), col("__lat_fixed").cast("string"),
      "Coordenada corrigida", "Latitude invalida", verifiedAt,
      fixedAsString = Some(col("__lat_fixed").cast("decimal(12,5)").cast("string")),
      changed = Some(changed(col(latColumn), col("__lat_plain"), col("__lat_fixed"))))
    val qaLon = Cleaner.columnQa(prep, meta, lonColumn,
      col(lonColumn).cast("string"), col("__lon_fixed").cast("string"),
      "Coordenada corrigida", "Longitude invalida", verifiedAt,
      fixedAsString = Some(col("__lon_fixed").cast("decimal(12,5)").cast("string")),
      changed = Some(changed(col(lonColumn), col("__lon_plain"), col("__lon_fixed"))))
    val base = prep
      .withColumn(latColumn, col("__lat_fixed"))
      .withColumn(lonColumn, col("__lon_fixed"))
    val cleaned = wktColumn.fold(base)(w =>
        base.withColumn(w, GeoFunctions.wktPoint(col(lonColumn), col(latColumn))))
      .drop("__lat_fixed", "__lon_fixed", "__lat_plain", "__lon_plain")
    CleanResult(cleaned, qaLat.unionByName(qaLon))
  }
}

/** CPF repair (patchwork.py:607-726). */
final case class CpfCleaner(
    meta: TableMeta,
    column: String,
    verifiedAt: Timestamp) extends Cleaner {

  def clean(df: DataFrame): CleanResult = {
    val fixed = CpfFunctions.cpfClean(col(column))
    val qa = Cleaner.columnQa(df, meta, column,
      col(column), fixed,
      "CPF normalizado", "CPF invalido", verifiedAt)
    CleanResult(df.withColumn(column, fixed), qa)
  }
}

/** Brazilian state (UF) validation (patchwork.py:728-758): uppercase then
  * membership in the 27-state enum, else null. */
final case class UfCleaner(
    meta: TableMeta,
    column: String,
    verifiedAt: Timestamp) extends Cleaner {

  def clean(df: DataFrame): CleanResult = {
    val fixed = UfCleaner.cleanUf(col(column))
    val qa = Cleaner.columnQa(df, meta, column, col(column), fixed,
      "UF normalizada", "UF invalida", verifiedAt)
    CleanResult(df.withColumn(column, fixed), qa)
  }
}

object UfCleaner {
  // patchwork.py:729-731
  val ValidUfs: Seq[String] = Seq(
    "AC", "AL", "AP", "AM", "BA", "CE", "DF", "ES", "GO", "MA", "MT", "MS",
    "MG", "PA", "PB", "PR", "PE", "PI", "RJ", "RN", "RS", "RO", "RR", "SC",
    "SP", "SE", "TO")

  def cleanUf(c: Column): Column = {
    val up = upper(trim(c))
    when(up.isin(ValidUfs: _*), up).otherwise(lit(null))
  }
}

/** Crop strings over a size limit to `size-3` chars + "..."
  * (patchwork.py:760-819). */
final case class TextCropperCleaner(
    meta: TableMeta,
    column: String,
    size: Int,
    verifiedAt: Timestamp) extends Cleaner {

  def clean(df: DataFrame): CleanResult = {
    val fixed = TextCropperCleaner.crop(col(column), size)
    val qa = Cleaner.columnQa(df, meta, column, col(column), fixed,
      s"Texto truncado para $size caracteres", "Texto invalido", verifiedAt)
    CleanResult(df.withColumn(column, fixed), qa)
  }
}

object TextCropperCleaner {
  def crop(c: Column, size: Int): Column =
    when(length(c) > size,
      concat(substring(c, 1, size - 3), lit("..."))).otherwise(c)
}

/** Canonical-value mapping via broadcast left join
  * (GSheetMappingCleaner, patchwork.py:821-897): values found in the
  * mapping are replaced by `valor_canonico`; others pass through. */
final case class MappingCleaner(
    meta: TableMeta,
    column: String,
    mapping: DataFrame, // columns: (<column>, valor_canonico)
    verifiedAt: Timestamp) extends Cleaner {

  def clean(df: DataFrame): CleanResult = {
    val m = broadcast(
      mapping.select(col(column).as("__map_key"),
        col("valor_canonico").as("__map_canon")).distinct())
    val joined = df.join(m, col(column) === col("__map_key"), "left")
    val fixed = coalesce(col("__map_canon"), col(column))
    val qa = Cleaner.columnQa(joined, meta, column, col(column), fixed,
      "Valor canonizado", "Valor removido", verifiedAt)
    CleanResult(
      joined.withColumn(column, fixed).drop("__map_key", "__map_canon"),
      qa)
  }
}

/** Two-key organization canonicalization with added columns and
  * drop-unmapped semantics (OrgaosMappingCleaner, patchwork.py:899-1103).
  * Rows without a mapping entry are dropped with a DROP_LINE QA record;
  * mapped rows gain the mapping's extra columns (ADD_COLUMN semantics). */
final case class MultiKeyMappingCleaner(
    meta: TableMeta,
    keys: Seq[String],
    mapping: DataFrame, // columns: keys ++ added columns
    verifiedAt: Timestamp) extends Cleaner {

  def clean(df: DataFrame): CleanResult = {
    val marked = broadcast(mapping.withColumn("__mapped", lit(true)))
    val joined = df.join(marked, keys, "left")
    val cleaned = joined.filter(col("__mapped").isNotNull).drop("__mapped")
    val qa = Cleaner.dropLineQa(
      joined.filter(col("__mapped").isNull).select(df.columns.map(col): _*),
      meta, "Orgao nao mapeado", verifiedAt)
    CleanResult(cleaned, qa)
  }
}
