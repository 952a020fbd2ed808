package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history — the warehouse-side
  * treatment the reference's incremental sync family stops short of
  * (fast_etl.py:437-450 merges keep only the LATEST row per key; a type-2
  * table keeps every version with its validity interval).
  *
  * Two entry points: [[fromChangeLog]] rebuilds a whole history from an
  * append-only change log (CDC replay / backfill), [[applySnapshot]]
  * advances an existing history by one periodic snapshot (the daily-load
  * path). Both are pure DataFrame transforms.
  *
  * Shape at scale: fromChangeLog is ONE key-hash exchange reused by the
  * change-flag window, the run aggregation, and the interval window (the
  * group/partition keys all contain the key columns, so EnsureRequirements
  * inserts no further shuffle). applySnapshot is one full-outer key join
  * producing every output row in a single pass — each joined row explodes
  * into its 0-2 verdict rows, so the |keys|-sized join output is scanned
  * once and nothing is retained. History keys must be non-null (business
  * keys; a NULL key never equi-joins and would silently drop).
  */
object Scd2 {

  /** Rebuild the full version history of `trackedCols` from a change log.
    *
    * One output row per (key, uninterrupted run of the tracked tuple) in
    * the ordering (`tsCol`, `tieCols`…): `version` (1-based per key),
    * `valid_from` = the run's first timestamp, `valid_to` = the next
    * run's `valid_from` (NULL while current), `n_events` = rows in the
    * run. Runs are split on IS DISTINCT FROM of the tracked tuple, so a
    * NULL tracked value forms a run like any other value, and a value
    * that recurs later opens a NEW version (type-2 semantics: intervals
    * never merge across an intervening change). */
  def fromChangeLog(log: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String], trackedCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "fromChangeLog needs at least one key column")
    require(trackedCols.nonEmpty, "fromChangeLog needs tracked columns")
    val keys = keyCols.map(col)
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val byKey = Window.partitionBy(keys: _*).orderBy(order: _*)
    val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tracked = struct(trackedCols.map(col): _*)
    val hist = log
      .withColumn("__chg",
        when(lag(tracked, 1).over(byKey) <=> tracked, 0L).otherwise(1L))
      .withColumn("version", sum(col("__chg")).over(run))
      .groupBy((keys :+ col("version")) ++ trackedCols.map(col): _*)
      .agg(min(col(tsCol)).as("valid_from"), count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy(keys: _*).orderBy(col("version"))
    hist.withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select((keys ++ Seq(col("version")) ++ trackedCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("n_events"))): _*)
  }

  /** Advance a type-2 history by one snapshot taken at `loadTs`.
    *
    * `hist` must carry exactly `keyCols ++ trackedCols ++ (valid_from,
    * valid_to)` with NULL `valid_to` marking the open version; `snap`
    * carries `keyCols ++ trackedCols` with AT MOST ONE row per key (a
    * duplicated snapshot key would fan out the join — dedupe upstream).
    * Per key: an unchanged tracked tuple keeps its open row; a changed
    * tuple closes it at `loadTs` and opens a new version; a key absent
    * from the snapshot is closed (delete detection); a new key opens its
    * first version. Closed history rows pass through untouched. */
  def applySnapshot(hist: DataFrame, snap: DataFrame, keyCols: Seq[String],
      trackedCols: Seq[String], loadTs: Column): DataFrame = {
    require(keyCols.nonEmpty, "applySnapshot needs at least one key column")
    val outCols = keyCols ++ trackedCols ++ Seq("valid_from", "valid_to")
    val closed = hist.filter(col("valid_to").isNotNull)
      .select(outCols.map(col): _*)
    val open = hist.filter(col("valid_to").isNull)
      .withColumn("__h", lit(true)).alias("h")
    val snapped = snap
      .select((keyCols ++ trackedCols).map(col): _*)
      .withColumn("__s", lit(true)).alias("s")
    val onKeys = keyCols.map(k => col(s"h.$k") === col(s"s.$k")).reduce(_ && _)
    val hPresent = col("__h") <=> lit(true)
    val sPresent = col("__s") <=> lit(true)
    val changed =
      !(struct(trackedCols.map(c => col(s"h.$c")): _*) <=>
        struct(trackedCols.map(c => col(s"s.$c")): _*))
    // every joined row yields its 0-2 verdict rows through one explode —
    // the three outcomes never re-scan the join output
    val nullTs = when(lit(false), loadTs) // NULL with loadTs's exact type
    // array() demands identical struct types INCLUDING field names, so
    // every verdict aliases its fields to the output positions
    def verdict(cond: Column, cols: Seq[Column]) =
      when(cond, struct(cols.zip(outCols).map { case (c, n) => c.as(n) }: _*))
    val rows = array(
      // close: key left the snapshot, or its tracked tuple changed
      verdict(hPresent && (!sPresent || changed),
        keyCols.map(k => col(s"h.$k")) ++
          trackedCols.map(c => col(s"h.$c")) ++
          Seq(col("h.valid_from"), loadTs)),
      // carry: still present with the same tracked tuple
      verdict(hPresent && sPresent && !changed,
        keyCols.map(k => col(s"h.$k")) ++
          trackedCols.map(c => col(s"h.$c")) ++
          Seq(col("h.valid_from"), nullTs)),
      // open: brand-new key, or the fresh version after a change
      verdict(sPresent && (!hPresent || changed),
        keyCols.map(k => col(s"s.$k")) ++
          trackedCols.map(c => col(s"s.$c")) ++
          Seq(loadTs, nullTs)))
    val joined = open.join(snapped, onKeys, "full_outer")
      .select(explode(filter(rows, r => r.isNotNull)).as("__r"))
      .select(outCols.map(c => col(s"__r.$c").as(c)): _*)
    closed.unionByName(joined)
  }
}
