package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Truly SEQUENTIAL per-key recurrences — the small class of operators a
  * window function cannot express because each row's state depends on a
  * DECISION made at an earlier row, not on the raw data alone:
  *
  *  - capped sessionization: a session breaks on a gap (windowable) OR
  *    when the span since the session START exceeds a cap — and the
  *    session start is itself the output of previous decisions;
  *  - debounce: keep a row only if enough time passed since the last
  *    KEPT row (not the last row).
  *
  * These use the secondary-sort pattern (the one sanctioned
  * mapPartitions case in this library, per the preference order in the
  * build contract): one hash repartition on the key, an in-partition
  * sort by (key, ts, tie), then a single streaming pass holding O(1)
  * state per key run — no group materialization, partition-order
  * deterministic because the traversal order is fully specified by the
  * sort. `groupByKey.flatMapGroups` is NOT used: its group iterator
  * order is unspecified, and re-sorting inside each group would
  * materialize it.
  *
  * Contract: key and tie columns must be integral (cast upstream);
  * timestamps enter as epoch micros.
  */
object Sequential {

  /** (user, tie, session_start_us, session_idx): sessions break when the
    * inter-event gap exceeds `gapUs` or the span since session start
    * exceeds `capUs` (runaway-session guard — bot streams never produce
    * an unbounded session). */
  def sessionizeCapped(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapUs: Long, capUs: Long): DataFrame = {
    require(gapUs > 0 && capUs > 0, s"bad gapUs=$gapUs capUs=$capUs")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("t"), col(tieCol).cast("long").as("id"))
      .repartition(col("u"))
      .sortWithinPartitions(col("u"), col("t"), col("id"))
      .as[(Long, Long, Long)]
    sorted.mapPartitions { it =>
      var haveU = false; var curU = 0L
      var sessStart = 0L; var prevT = 0L; var idx = 0L
      it.map { case (u, t, id) =>
        if (!haveU || u != curU) {
          haveU = true; curU = u; sessStart = t; prevT = t; idx = 1L
        } else if (t - prevT > gapUs || t - sessStart > capUs) {
          sessStart = t; prevT = t; idx += 1L
        } else prevT = t
        (u, id, sessStart, idx)
      }
    }.toDF(userCol, tieCol, "session_start_us", "session_idx")
  }

  /** Per-key exponentially weighted moving average — the classic
    * sequential smoother `s_i = α·v_i + (1−α)·s_{i−1}`, seeded with the
    * key's first value. A window cannot express it (each output folds
    * EVERY prior row with geometrically decaying weight; the closed
    * form Σ α(1−α)^j·v_{i−j} is numerically different and O(n²) as a
    * frame), so it rides the same secondary-sort pass. Reproducibility:
    * the recurrence is evaluated as the fixed IEEE expression
    * `α·v + β·s` (β = 1−α computed once) — any engine replaying that
    * exact per-row expression over the same (ts, tie) order produces
    * bit-identical doubles, which is how the DuckDB recursive-CTE
    * oracle checks it. Returns (key, tie, value, ewma). */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"bad alpha=$alpha")
    val beta = 1.0 - alpha
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("t"), col(tieCol).cast("long").as("id"),
        col(valueCol).cast("double").as("v"))
      .repartition(col("u"))
      .sortWithinPartitions(col("u"), col("t"), col("id"))
      .as[(Long, Long, Long, Double)]
    sorted.mapPartitions { it =>
      var haveU = false; var curU = 0L; var s = 0.0
      it.map { case (u, t, id, v) =>
        if (!haveU || u != curU) { haveU = true; curU = u; s = v }
        else s = alpha * v + beta * s
        (u, id, v, s)
      }
    }.toDF(keyCol, tieCol, valueCol, "ewma")
  }

  /** Rows surviving a per-key debounce: the first row is kept, and a row
    * is kept iff at least `minGapUs` passed since the last KEPT row —
    * the rate-limiting dedup for retriggered events (a windowed gap
    * against the previous ROW would re-admit a burst's every other
    * element). Returns (user, tie) of survivors. */
  def debounce(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, minGapUs: Long): DataFrame = {
    require(minGapUs > 0, s"bad minGapUs=$minGapUs")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("t"), col(tieCol).cast("long").as("id"))
      .repartition(col("u"))
      .sortWithinPartitions(col("u"), col("t"), col("id"))
      .as[(Long, Long, Long)]
    sorted.mapPartitions { it =>
      var haveU = false; var curU = 0L; var lastKept = 0L
      it.flatMap { case (u, t, id) =>
        if (!haveU || u != curU) {
          haveU = true; curU = u; lastKept = t
          Some((u, id))
        } else if (t - lastKept >= minGapUs) {
          lastKept = t
          Some((u, id))
        } else None
      }
    }.toDF(userCol, tieCol)
  }
}
