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
    wktColumn: Option[String] = None,
    scope: graft.core.CacheScope = graft.core.CacheScope.session)
  extends Cleaner {

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
    // `scope` owns the release — see CacheScope.
    val prep = scope.retain(df
      .withColumn("__lat_fixed", GeoFunctions.cleanLat(col(latColumn)))
      .withColumn("__lon_fixed", GeoFunctions.cleanLon(col(lonColumn)))
      .withColumn("__lat_plain", trim(col(latColumn)).cast("double"))
      .withColumn("__lon_plain", trim(col(lonColumn)).cast("double")))
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

/** CPF repair (patchwork.py:607-726), with the reference's full QA
  * cascade — one cell can log TWO rows (e.g. separator-strip CAST_FIX
  * plus checksum CAST_NULL; SURVEY §7.5.3) — expressed as a union of
  * filtered projections.
  *
  * `strict = false` (default) is bug-for-bug reference-faithful: an
  * 11-digit value with bad check digits is QA-logged CAST_NULL but the
  * digits are KEPT (patchwork.py:691-700 logs and falls through without
  * returning None). `strict = true` nulls it, matching
  * `CpfFunctions.cpfClean`.
  */
final case class CpfCleaner(
    meta: TableMeta,
    column: String,
    verifiedAt: Timestamp,
    strict: Boolean = false) extends Cleaner {

  def clean(df: DataFrame): CleanResult = {
    val c = col(column)
    // reference pipeline state (patchwork.py:634-711)
    val stripped = translate(c, CpfCleaner.Separators, "")
    val hasGarbage = c.isNotNull && trim(c) =!= "" &&
      stripped.rlike("[^0-9]")
    val digits = substring(regexp_replace(c, "[^0-9]", ""), 1, 11)
    // empty digit strings (separator-only input like "..") count as
    // zeroed — a bare `cast < 2` yields NULL there, which would
    // short-circuit the whole rejection cascade and emit "00000000000"
    val zeroed = digits === "" || digits.cast("long") < 2
    val allSame = digits === repeat(substring(digits, 1, 1), length(digits))
    val short = length(digits) < 11
    val padded = lpad(digits, 11, "0")
    val padOk = CpfFunctions.cpfChecksumOk(padded)
    val fullOk = CpfFunctions.cpfChecksumOk(digits)
    val considered = c.isNotNull && trim(c) =!= ""
    val nulled = hasGarbage ||
      (considered && !hasGarbage && zeroed) ||
      (considered && !hasGarbage && !zeroed && allSame) ||
      (considered && !hasGarbage && !zeroed && !allSame && short && !padOk)
    val keptValue = when(short, padded).otherwise(digits)
    // null/empty input returns null immediately (patchwork.py:627-628)
    val fixed0 =
      if (strict)
        when(nulled || (!short && !fullOk), lit(null)).otherwise(keptValue)
      else
        when(nulled, lit(null)).otherwise(keptValue)
    val fixed = when(!considered, lit(null)).otherwise(fixed0)

    val prep = df
      .withColumn("__fixed", fixed)
      .withColumn("__digits", digits)
      .withColumn("__padded", padded)

    def arm(cond: Column, nivel: Int, motivo: String,
        consideredValue: Column): DataFrame =
      Cleaner.columnQa(prep.filter(cond), meta, column,
        c, consideredValue, motivo, motivo, verifiedAt,
        changed = Some(lit(true)),
        fixedAsString = Some(consideredValue))
        .withColumn("nivel_erro", lit(nivel))
        .withColumn("motivo", lit(motivo))

    val nullLit = lit(null).cast("string")
    val qa = Seq(
      arm(hasGarbage, QaLevel.CastNull,
        "Valor desconsiderado por conter caracteres invalidos.", nullLit),
      arm(considered && !hasGarbage && zeroed, QaLevel.CastNull,
        "Valor desconsiderado por estar zerado.", nullLit),
      arm(considered && !hasGarbage && !zeroed && allSame, QaLevel.CastNull,
        "Valor desconsiderado por conter 11 digitos repetidos.", nullLit),
      arm(considered && !hasGarbage && !zeroed && !allSame && short && !padOk,
        QaLevel.CastNull,
        "Valor desconsiderado por conter menos de 11 digitos.", nullLit),
      arm(considered && !hasGarbage && !zeroed && !allSame && short && padOk,
        QaLevel.CastFix,
        "Preenchidos zeros a esquerda por conter menos de 11 digitos.",
        col("__padded")),
      arm(considered && !hasGarbage && !zeroed && !allSame && !short && !fullOk,
        QaLevel.CastNull,
        "Valor desconsiderado pois os 2 digitos verificadores nao conferem.",
        nullLit),
      // separator strip logs CAST_FIX whenever the raw text was longer
      // than the surviving digit string (patchwork.py:702-709)
      arm(considered && !hasGarbage && !zeroed && !allSame &&
          (short && padOk || !short) &&
          length(c) > length(when(short, col("__padded")).otherwise(col("__digits"))),
        QaLevel.CastFix,
        "Retirados separadores do valor do CPF.",
        when(short, col("__padded")).otherwise(col("__digits")))
    ).reduce(_ unionByName _)

    CleanResult(
      prep.withColumn(column, col("__fixed"))
        .drop("__fixed", "__digits", "__padded"),
      qa)
  }
}

object CpfCleaner {
  val Separators = ".-" // patchwork.py:609
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
    val dropQa = Cleaner.dropLineQa(
      joined.filter(col("__mapped").isNull).select(df.columns.map(col): _*),
      meta, "Orgao nao mapeado", verifiedAt)
    // ADD_COLUMN QA (patchwork.py:989-1026): one row per added-column
    // cell that received a mapped value.
    val addedCols = mapping.columns.filterNot(keys.contains)
    val addQa = addedCols.map { c =>
      Cleaner.columnQa(
        cleaned.filter(col(c).isNotNull), meta, c,
        lit(null).cast("string"), col(c).cast("string"),
        s"Coluna $c adicionada pelo mapeamento.", "", verifiedAt,
        changed = Some(lit(true)))
        .withColumn("nivel_erro", lit(QaLevel.AddColumn))
    }
    CleanResult(cleaned, addQa.foldLeft(dropQa)(_ unionByName _))
  }
}
