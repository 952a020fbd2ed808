package graft.clean

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cleaning/QA framework — Spark restatement of the reference's patchwork
  * module (fastetl/custom_functions/patchwork.py).
  *
  * A cleaner is a pure transformation `DataFrame => CleanResult(cleaned,
  * qa)`. The QA log is derived *relationally* — a filtered projection of
  * the same scan, never a row-wise callback — so the whole pipeline stays
  * inside whole-stage codegen and scales horizontally. The QA schema is the
  * reference's fixed 10-column layout (patchwork.py:283-287).
  */
object QaLevel {
  // patchwork.py:38-42
  val CastFix = 1
  val CastNull = 2
  val DropLine = 3
  val AddColumn = 4
}

/** Identity of the table being cleaned (patchwork.py:264-287 holds the
  * same tuple on BaseDataCleaner). */
final case class TableMeta(
    sourceId: String,
    schema: String,
    table: String,
    primaryKeys: Seq[String])

final case class CleanResult(cleaned: DataFrame, qa: DataFrame)

trait Cleaner {
  def meta: TableMeta
  def clean(df: DataFrame): CleanResult
}

object Cleaner {

  /** QA log schema — patchwork.py:283-287 / FIXTURES.md A3. */
  val qaSchema: StructType = StructType(Seq(
    StructField("primary_keys_labels", StringType),
    StructField("primary_keys_values", StringType),
    StructField("esquema", StringType),
    StructField("tabela", StringType),
    StructField("coluna", StringType),
    StructField("valor_original", StringType),
    StructField("valor_considerado", StringType),
    StructField("nivel_erro", IntegerType),
    StructField("motivo", StringType),
    StructField("datahora_verificacao", TimestampType)))

  private def pkValues(pks: Seq[String]): Column =
    concat_ws(",", pks.map(k => col(k).cast(StringType)): _*)

  /** QA rows for a single-column value fix: one row per cell where the
    * fixed value differs from the original (null-safe). `nivel` is
    * CAST_FIX when a non-null replacement was produced, CAST_NULL when the
    * value was rejected to null (patchwork.py:289-321 `_qa_log`).
    *
    * `origAsString`/`fixedAsString` default to plain string casts; pass
    * explicit renderings (e.g. decimal-formatted) when the driver needs
    * engine-stable text.
    */
  def columnQa(
      df: DataFrame,
      meta: TableMeta,
      coluna: String,
      orig: Column,
      fixed: Column,
      motivoFix: String,
      motivoNull: String,
      verifiedAt: Timestamp,
      origAsString: Option[Column] = None,
      fixedAsString: Option[Column] = None,
      changed: Option[Column] = None): DataFrame =
    df.filter(changed.getOrElse(!(orig <=> fixed)))
      .select(
        lit(meta.primaryKeys.mkString(",")).as("primary_keys_labels"),
        pkValues(meta.primaryKeys).as("primary_keys_values"),
        lit(meta.schema).as("esquema"),
        lit(meta.table).as("tabela"),
        lit(coluna).as("coluna"),
        origAsString.getOrElse(orig.cast(StringType)).as("valor_original"),
        fixedAsString.getOrElse(fixed.cast(StringType)).as("valor_considerado"),
        when(fixed.isNull, lit(QaLevel.CastNull))
          .otherwise(lit(QaLevel.CastFix)).as("nivel_erro"),
        when(fixed.isNull, lit(motivoNull))
          .otherwise(lit(motivoFix)).as("motivo"),
        lit(verifiedAt).as("datahora_verificacao"))

  /** QA rows for dropped lines (`nivel_erro = DROP_LINE`): `coluna` holds
    * the PK list, values hold the dropped row's keys (patchwork.py:389-412). */
  def dropLineQa(
      dropped: DataFrame,
      meta: TableMeta,
      motivo: String,
      verifiedAt: Timestamp): DataFrame =
    dropped.select(
      lit(meta.primaryKeys.mkString(",")).as("primary_keys_labels"),
      pkValues(meta.primaryKeys).as("primary_keys_values"),
      lit(meta.schema).as("esquema"),
      lit(meta.table).as("tabela"),
      lit(meta.primaryKeys.mkString(",")).as("coluna"),
      lit(null).cast(StringType).as("valor_original"),
      lit(null).cast(StringType).as("valor_considerado"),
      lit(QaLevel.DropLine).as("nivel_erro"),
      lit(motivo).as("motivo"),
      lit(verifiedAt).as("datahora_verificacao"))

  /** Union the QA outputs of a chain of cleaners applied in sequence
    * (patchwork DAG: each task's output feeds the next,
    * patchwork.py:1-17). */
  def chain(df: DataFrame, cleaners: Seq[Cleaner]): CleanResult =
    cleaners.foldLeft(CleanResult(df, emptyQa(df))) { (acc, c) =>
      val r = c.clean(acc.cleaned)
      CleanResult(r.cleaned, acc.qa.unionByName(r.qa))
    }

  private def emptyQa(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], qaSchema)
}
