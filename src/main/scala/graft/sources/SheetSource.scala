package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Naming

/** Spreadsheet connector shape — GSheetHook (hooks/gsheet_hook.py:125-193)
  * re-expressed as a pluggable `SheetService`: the Google API transport
  * lives behind the trait (driver-side, bounded size — a worksheet is
  * never big data); the engine-side contract is cells -> DataFrame with
  * the reference's header conventions:
  *   - first row as header (get_gsheet_df has_header=True)
  *   - headers slugified (gsheet_hook.py:148-151)
  *   - empty-header columns dropped (P3, operators/gsheet_operator.py:61,95)
  * Writes mirror set_df_to_gsheet: header row + stringified cells from A1.
  */
object SheetSource {

  trait SheetService extends Serializable {
    def readCells(sheetName: String): Seq[Seq[String]]
    def writeCells(sheetName: String, cells: Seq[Seq[String]]): Unit
  }

  /** In-memory fake for tests/offline development. */
  final class InMemorySheetService extends SheetService {
    private val sheets = scala.collection.mutable.Map[String, Seq[Seq[String]]]()
    def readCells(sheetName: String): Seq[Seq[String]] =
      sheets.getOrElse(sheetName, Seq.empty)
    def writeCells(sheetName: String, cells: Seq[Seq[String]]): Unit =
      sheets(sheetName) = cells
  }

  /** Worksheet -> DataFrame (S6): header slugify + empty-header drop.
    * All columns arrive as strings (the sheet has no types); callers cast
    * downstream like the reference does. */
  def toDf(spark: SparkSession, service: SheetService, sheetName: String,
      hasHeader: Boolean = true): DataFrame = {
    val cells = service.readCells(sheetName)
    if (cells.isEmpty) return spark.emptyDataFrame
    val (header, rows) =
      if (hasHeader) (cells.head.map(Naming.slugify), cells.tail)
      else (cells.head.indices.map(i => s"col_$i"), cells)
    val keep = header.zipWithIndex.filter(_._1.nonEmpty)
    val schema = StructType(keep.map { case (n, _) => StructField(n, StringType) })
    val data = rows.map(r => Row.fromSeq(keep.map { case (_, i) =>
      if (i < r.length) r(i) else null
    }))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq), schema)
  }

  /** DataFrame -> worksheet (K7): header + stringified cells; bounded
    * collect is the contract (sheets cap at ~10M cells). */
  def fromDf(df: DataFrame, service: SheetService, sheetName: String,
      maxRows: Int = 100000): Unit = {
    val header = df.columns.toSeq
    val rows = df.limit(maxRows).collect().toSeq
      .map(r => r.toSeq.map(v => if (v == null) "" else v.toString))
    service.writeCells(sheetName, header +: rows)
  }
}
