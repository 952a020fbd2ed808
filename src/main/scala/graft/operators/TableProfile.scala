package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiler: per-column null count, exact distinct count,
  * and numeric min/max — the data-quality report a load pipeline emits
  * beside every table it lands (the reference's QA checks generalized
  * from single columns to whole tables).
  *
  * Scale shape: ONE aggregation over the table. Multiple exact
  * count(DISTINCT) columns plan as a single Expand + two-phase aggregate
  * (rows × |cols| intermediate, partial-combined map-side) — one scan,
  * no per-column jobs, no driver loop. The wide 1-row result is then
  * unpivoted to long form driver-side-free (it is 1 row × k columns
  * before the melt). For trillion-row tables swap `exact = false` to
  * estimate distincts with HLL++ (approx_count_distinct) and keep the
  * Expand out of the plan entirely.
  */
object TableProfile {

  /** Numeric-ish rendering of min/max: numeric → double, timestamp →
    * epoch micros as double, boolean → 0/1, date → epoch days; other
    * types (strings, binaries, arrays) → null. */
  private def numView(dt: DataType, c: String) = dt match {
    case _: NumericType => col(c).cast("double")
    case TimestampType | TimestampNTZType => unix_micros(col(c).cast("timestamp")).cast("double")
    case DateType => datediff(col(c), lit("1970-01-01").cast("date")).cast("double")
    case BooleanType => col(c).cast("int").cast("double")
    case _ => lit(null).cast("double")
  }

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              exact: Boolean = true): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val aggs = cols.flatMap { c =>
      val dt = df.schema(c).dataType
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__distinct_$c"),
        min(numView(dt, c)).as(s"__min_$c"),
        max(numView(dt, c)).as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // 1-row melt: one struct per column, explode to long form.
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_num"),
        col(s"__max_$c").as("max_num"))
    }
    wide.select(explode(array(entries: _*)).as("p"))
      .select(col("p.column"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_num"), col("p.max_num"))
  }
}
