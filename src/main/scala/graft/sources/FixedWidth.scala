package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Fixed-width text source/sink — the layout government registries and
  * bank interchange files (CNAB-style remittances, IBGE/RAIS extracts)
  * still ship in: every record is one line, every field a fixed
  * character window, no delimiters at all. The reference ingests these
  * agency drops alongside CSVs (fastETL's SMB/file-drop loaders,
  * fastetl/custom_functions/fast_etl.py); here the parse itself is
  * engine-native.
  *
  * Layout is a `Seq[Field]` of (name, width, type); fields are CUT by
  * CHARACTER offsets (`substring` — multi-byte text is safe as long as
  * the producer counted characters; byte-counted legacy layouts should
  * be decoded to single-byte-safe charsets upstream, the XlsSource
  * codepage precedent). Values are right-padded with spaces on write;
  * reads `rtrim` each window (ONLY the pad side — leading spaces are
  * data and round-trip), map all-blank windows to NULL, then cast
  * — under ANSI-off, a window that fails its cast lands NULL (the
  * TRY_CAST convention shared with the DuckDB oracle).
  *
  * Scale contract: the parse is a pure per-line projection (one scan,
  * zero shuffles, codegen substring/trim/cast chain — no UDF); text
  * files split by line across tasks, so a 100 TB drop parallelizes by
  * `maxPartitionBytes` like any text source. The writer concatenates
  * the same windows map-side. Records shorter than the layout read as
  * NULL-padded tails (substring past end is empty ⇒ NULL), longer ones
  * ignore the overhang — both documented degradations, not errors.
  */
object FixedWidth {

  /** One field window: `width` in CHARACTERS; `dataType` is the target
    * Spark type (string fields keep internal spaces, only the pad is
    * trimmed). */
  final case class Field(name: String, width: Int, dataType: String = "string")

  private def offsets(layout: Seq[Field]): Seq[(Field, Int)] =
    layout.zip(layout.scanLeft(1)((pos, f) => pos + f.width).init)

  /** Parse a fixed-width text file into typed columns. */
  def read(spark: SparkSession, path: String,
      layout: Seq[Field]): DataFrame = {
    require(layout.nonEmpty, "empty layout")
    val raw = spark.read.text(path)
    parseLines(raw.select(col("value")), "value", layout)
  }

  /** The same parse over an existing string column (e.g. records
    * arriving through a queue or a zipped drop) — drops `lineCol`,
    * keeps every other input column. */
  def parseLines(df: DataFrame, lineCol: String,
      layout: Seq[Field]): DataFrame = {
    val cols: Seq[Column] = offsets(layout).map { case (f, pos) =>
      // rtrim, not trim: the writer right-pads, so ONLY the right-side
      // pad is synthetic — leading spaces are data and must round-trip.
      val window = rtrim(substring(col(lineCol), pos, f.width))
      val nulled = when(length(window) === 0, lit(null).cast("string"))
        .otherwise(window)
      (if (f.dataType == "string") nulled
       else nulled.cast(DataType.fromDDL(f.dataType))).as(f.name)
    }
    val keep = df.columns.filter(_ != lineCol).map(col).toSeq
    df.select(keep ++ cols: _*)
  }

  /** Render typed columns into fixed windows and write as text. NULLs
    * serialize as all-blank windows (the read maps them back to NULL);
    * a value LONGER than its window is an error in the layout, not
    * data to truncate silently — require() guards it per row via an
    * overflow sentinel column check on write. */
  def write(df: DataFrame, path: String, layout: Seq[Field]): Unit =
    formatLines(df, layout).write.mode("overwrite").text(path)

  /** The line-rendering half of [[write]], exposed for tests and
    * non-file sinks: returns a single-column ("value") DataFrame. */
  def formatLines(df: DataFrame, layout: Seq[Field]): DataFrame = {
    require(layout.nonEmpty, "empty layout")
    val windows = layout.map { f =>
      val s = coalesce(col(f.name).cast("string"), lit(""))
      // overflow guard: raise at scan time rather than corrupt framing
      // (raise_error is codegen'd; the happy path is rpad only)
      when(length(s) > f.width,
        raise_error(concat(lit(s"fixed-width overflow in '${f.name}': "),
          s, lit(s" exceeds ${f.width} chars"))))
        .otherwise(rpad(s, f.width, " "))
    }
    df.select(concat(windows: _*).as("value"))
  }
}
