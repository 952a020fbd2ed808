package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSON Lines source/sink — the interchange format LLM training corpora
  * actually ship in (one UTF-8 JSON object per line; newlines, quotes
  * and non-ASCII inside fields are JSON-escaped, so the framing is
  * line-safe where raw CSV is not). Complements the reference-derived
  * CSV extract (`operators.CsvExtract`) and the parquet-native tables.
  *
  * Scale contract: [[read]] REQUIRES an explicit schema — Spark's JSON
  * schema inference is a full extra pass over the dataset (unacceptable
  * at corpus scale) and can silently widen types between runs;
  * [[inferSchema]] exists for interactive exploration only and says so.
  * Reads run PERMISSIVE with the corrupt-record column surfaced, so a
  * torn line quarantines relationally (the multimodal undecodable→NULL
  * convention) instead of failing the job or silently dropping.
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Distributed JSON-Lines write (one file per partition; compression
    * e.g. "gzip" for interchange, None for splittable local reads). */
  def write(df: DataFrame, path: String,
      compression: Option[String] = None): Unit = {
    var w = df.write.mode("overwrite")
    compression.foreach(c => w = w.option("compression", c))
    w.json(path)
  }

  /** Schema-explicit read; rows that fail to parse land with every data
    * column null and the raw line in [[CorruptCol]]. */
  def read(spark: SparkSession, path: String, schema: StructType)
      : DataFrame = {
    val withCorrupt = schema.add(CorruptCol, "string")
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Clean rows only, malformed lines dropped at parse time
    * (DROPMALFORMED — not a filter on [[CorruptCol]]: Spark forbids
    * plans whose only referenced column is the corrupt record, which a
    * column-pruned count over such a filter becomes). Use [[read]] when
    * the torn lines themselves must be surfaced. */
  def readClean(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** Interactive-only schema inference: a FULL extra pass over the
    * data. Never call on a corpus-sized path — pass the schema. */
  def inferSchema(spark: SparkSession, path: String): StructType =
    spark.read.json(path).schema
}
