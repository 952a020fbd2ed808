package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hampel filter: rolling-median outlier detection over a per-key
  * ordered series — flag x_i when |x_i − median(window)| exceeds
  * 3·1.4826·MAD(window). The robust alternative to z-score spike
  * detection ([[Anomaly]]): one wild value cannot drag the center OR
  * the spread, so isolated spikes are flagged without masking.
  *
  * Exactness: values quantize to micro units (DECIMAL(18,2)·100 →
  * long); the frame is materialized as a SORTED ARRAY (collect over a
  * bounded ±w ROWS window — 2w+1 ≤ 15 elements, cheap), so the doubled
  * frame median m2 = sorted[⌈n/2⌉] + sorted[⌊n/2⌋+1] and the QUADRUPLED
  * MAD mad4 (doubled median of the doubled deviations |2x − m2|) are
  * exact integers whatever the engine; the only double is the closing
  * fixed-shape threshold compare 2·dev > 3·1.4826·mad4.
  *
  * Scale shape: ONE keyed window exchange; the array ops are per-row
  * over ≤ 2w+1 elements, fully codegen'd. Edge rows use the truncated
  * frame (standard Hampel boundary behavior). Output: the input keys
  * plus vm (micro value), m2, mad4, is_outlier. */
object Hampel {

  private def d(c: Column) = c.cast("decimal(18,2)")

  def filter(df: DataFrame, keyCol: String, orderCol: String,
      tieCol: String, valueCol: String, halfWindow: Int = 3,
      nSigma: Double = 3.0): DataFrame = {
    require(halfWindow >= 1 && halfWindow <= 7,
      "halfWindow must be in [1, 7] — the frame is materialized per row")
    val base = df
      .filter(col(valueCol).isNotNull)
      .withColumn("vm", (d(col(valueCol)) * 100).cast("long"))
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
      .rowsBetween(-halfWindow, halfWindow)
    val arr = sort_array(collect_list(col("vm")).over(frame))
    val out = base
      .withColumn("__arr", arr)
      .withColumn("__sz", size(col("__arr")))
      // doubled median of the sorted frame: lower + upper middle
      .withColumn("m2",
        element_at(col("__arr"), ((col("__sz") + 1) / 2).cast("int")) +
          element_at(col("__arr"), (col("__sz") / 2 + 1).cast("int")))
      .withColumn("__dev",
        sort_array(transform(col("__arr"),
          v => abs(v * 2 - col("m2")))))
      .withColumn("mad4",
        element_at(col("__dev"), ((col("__sz") + 1) / 2).cast("int")) +
          element_at(col("__dev"), (col("__sz") / 2 + 1).cast("int")))
    out.select(col(keyCol), col(orderCol), col(tieCol), col("vm"),
      col("m2"), col("mad4"),
      ((abs(col("vm") * 2 - col("m2")) * 2).cast("double") >
        lit(nSigma) * lit(1.4826) * col("mad4").cast("double"))
        .as("is_outlier"))
  }
}
