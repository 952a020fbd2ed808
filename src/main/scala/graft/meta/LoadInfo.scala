package graft.meta

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Load-audit log — the reference's `consumo_dados` table
  * (utils/load_info.py:50-103, written per load at fast_etl.py:347-352):
  * one row per load with (source, schema, table, user, load type,
  * timestamp, row count).
  *
  * The row count comes from `df.observe` when attached to a live write
  * (zero extra scan) or from `count()` for a standalone audit.
  */
object LoadInfo {

  final case class Entry(
      no_vdb: String,
      no_schema: String,
      no_tabela: String,
      no_usuario: String,
      tp_carga: String, // "full" | "incremental"
      dt_consumo: Timestamp,
      qt_linhas: Long)

  def auditRow(
      spark: SparkSession,
      vdb: String, schema: String, table: String, user: String,
      loadType: String, at: Timestamp, rowCount: Long): DataFrame = {
    import spark.implicits._
    Seq(Entry(vdb, schema, table, user, loadType, at, rowCount)).toDF()
  }

  /** Audit a copied DataFrame: counts with one aggregate (the scan is the
    * copy's own scan when the caller reuses a cached plan). */
  def audit(
      df: DataFrame,
      vdb: String, schema: String, table: String, user: String,
      loadType: String, at: Timestamp): DataFrame =
    auditRow(df.sparkSession, vdb, schema, table, user, loadType, at,
      df.count())

  /** Zero-extra-scan variant: attach an `observe` metric to the load plan
    * and register a QueryExecutionListener that invokes `onAudit` with
    * the observed row count when the write completes — the reference's
    * save_load_info epilogue (fast_etl.py:345-352) without a second pass
    * over the data. Returns the instrumented DataFrame to write. */
  def observed(
      df: DataFrame, observationName: String,
      onAudit: Long => Unit): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.functions._
    val instrumented = df.observe(observationName, count(lit(1)).as("rows"))
    // Self-unregistering: a long-lived session auditing many loads must
    // not accumulate listeners (each would re-fire for every later query
    // carrying the same observation name -> duplicate audit rows).
    val listener: org.apache.spark.sql.util.QueryExecutionListener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          qe.observedMetrics.get(observationName).foreach { row =>
            try onAudit(row.getAs[Long]("rows"))
            finally spark.listenerManager.unregister(this)
          }
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit =
          spark.listenerManager.unregister(this)
      }
    spark.listenerManager.register(listener)
    instrumented
  }
}
