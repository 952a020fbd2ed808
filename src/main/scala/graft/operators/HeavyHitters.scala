package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate heavy hitters via a mergeable Misra-Gries summary — the
  * scale path for "top frequent values" when the key domain is too large
  * to groupBy: a full count of distinct URLs/tokens/domains over 100 TB
  * shuffles billions of (key, 1) groups, while this aggregator ships ONE
  * bounded k-entry summary per partition and merges them on the reducer.
  * The complement of [[TopKAggregator]] (which needs pre-scored rows)
  * and the HLL distinct-count estimator (cardinality, not identity).
  *
  * Guarantees (Misra-Gries, and the Agarwal et al. "Mergeable Summaries"
  * merge): estimates UNDERCOUNT, with true − est ≤ err_bound ≤
  * n/(k+1), where err_bound is the summary's actually-accumulated
  * decrement total (usually far below the worst case). Every key with
  * frequency > n/(k+1) is guaranteed present. With k ≥ |distinct keys|
  * no decrement ever fires: the summary is EXACT and err_bound = 0 —
  * the regime the DuckDB oracle checks; the approximate regime is
  * property-checked against the bounds in the spec.
  *
  * Cost: amortized O(1) per row — a decrement pass costs O(k) but at
  * most n/(k+1) such passes can occur (each destroys k+1 units of
  * mass); merges are O(k log k). The buffer is a k-bounded map, so
  * map-side partial aggregation keeps per-task state constant no matter
  * how many rows a partition holds.
  */
object HeavyHitters {

  /** Misra-Gries buffer: bounded counter map + total decrements applied
    * (the per-summary error bound). */
  final case class MG(counts: mutable.Map[String, Long], var dec: Long) {

    def insert(key: String, k: Int): MG = {
      counts.get(key) match {
        case Some(c) => counts.update(key, c + 1)
        case None if counts.size < k => counts.update(key, 1L)
        case None => // full and absent: decrement-all, drop zeros
          dec += 1
          val dead = mutable.ArrayBuffer.empty[String]
          counts.foreach { case (w, c) =>
            if (c == 1L) dead += w else counts.update(w, c - 1)
          }
          dead.foreach(counts.remove)
      }
      this
    }

    def mergeWith(other: MG, k: Int): MG = {
      other.counts.foreach { case (w, c) =>
        counts.update(w, counts.getOrElse(w, 0L) + c)
      }
      dec += other.dec
      if (counts.size > k) {
        // subtract the (k+1)-th largest count from everything; at most
        // k survivors remain and every estimate shrinks by ≤ that cut,
        // which joins the error bound
        val cut = counts.values.toSeq.sorted(Ordering[Long].reverse)(k)
        dec += cut
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreach { case (w, c) =>
          if (c <= cut) dead += w else counts.update(w, c - cut)
        }
        dead.foreach(counts.remove)
      }
      this
    }

    /** (key, est, err_bound) sorted (est desc, key asc) — deterministic
      * output order for a given summary state. */
    def result: Seq[(String, Long, Long)] =
      counts.toSeq.sortBy { case (w, c) => (-c, w) }
        .map { case (w, c) => (w, c, dec) }
  }

  final class MisraGries(k: Int)
      extends Aggregator[String, MG, Seq[(String, Long, Long)]] {
    require(k >= 1, s"summary capacity must be >= 1, got $k")
    def zero: MG = MG(mutable.Map.empty, 0L)
    def reduce(b: MG, key: String): MG = b.insert(key, k)
    def merge(a: MG, b: MG): MG = a.mergeWith(b, k)
    def finish(b: MG): Seq[(String, Long, Long)] = b.result
    def bufferEncoder: Encoder[MG] = Encoders.kryo[MG]
    def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  /** (groupCols..., item, est, err_bound): heavy-hitter candidates per
    * group (globally with groupCols = Nil). NULL items are excluded —
    * a NULL key is "no value", not a frequent value.
    *
    * `item` keeps the input column's type: keys ride through the summary
    * as strings and are cast back on output, which is lossless for the
    * string/integral/date/boolean keys heavy-hitting makes sense on
    * (keys whose string rendering is not injective — e.g. binary —
    * would merge; don't sketch those). */
  def heavyHitters(df: DataFrame, groupCols: Seq[String], itemCol: String,
      k: Int): DataFrame = {
    val itemType = df.schema(itemCol).dataType
    val agg = udaf(new MisraGries(k))
    df.filter(col(itemCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(itemCol).cast("string")).as("__hh"))
      .select(groupCols.map(col) :+ explode(col("__hh")).as("__x"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__x._1").cast(itemType).as("item"),
        col("__x._2").as("est"),
        col("__x._3").as("err_bound")): _*)
  }

  /** Incremental ingest path: fold a new batch's summary TABLE (the
    * `heavyHitters` output shape — groupCols*, item, est, err_bound)
    * into a stored one, relationally — the same Agarwal-merge the
    * in-memory buffer performs (sum counts per item, subtract the
    * (k+1)-th largest, drop non-positive, fold the cut into the error
    * bound), expressed as one union + aggregation + per-group rank so
    * continuous pipelines can keep heavy-hitter state as a plain table
    * across restarts, like the minhash/LSH/IVF/agg state paths. State
    * per group is ≤ 2k rows before the cut — the shuffle is summary-
    * sized, never corpus-sized. The result is bit-identical to running
    * `MG.mergeWith` on the two summaries. */
  def mergeSummaryTables(stored: DataFrame, batch: DataFrame,
      groupCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"summary capacity must be >= 1, got $k")
    val gs = groupCols.map(col)
    def decOf(df: DataFrame, as: String) = {
      // err_bound is the group's decrement total replicated per row; a
      // group can also be ABSENT from one side (dec 0 contribution)
      if (groupCols.isEmpty) df.agg(max(col("err_bound")).as(as))
      else df.groupBy(gs: _*).agg(max(col("err_bound")).as(as))
    }
    val summed = stored.unionByName(batch)
      .groupBy(gs :+ col("item"): _*)
      .agg(sum(col("est")).as("est"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("est").desc, col("item"))
    // the (k+1)-th largest count, as an ALWAYS-one-row-per-group
    // aggregate (null when ≤ k items survive — no cut that round)
    val ranked = summed.withColumn("__rn", row_number().over(w))
    val cutExpr = max(when(col("__rn") === k + 1, col("est"))).as("__cut")
    val cuts =
      if (groupCols.isEmpty) ranked.agg(cutExpr)
      else ranked.groupBy(gs: _*).agg(cutExpr)
    val decs =
      if (groupCols.isEmpty) decOf(stored, "__da").crossJoin(decOf(batch, "__db"))
      else decOf(stored, "__da")
        .join(decOf(batch, "__db"), groupCols, "full_outer")
    val joined =
      if (groupCols.isEmpty) summed.crossJoin(cuts).crossJoin(decs)
      else summed.join(cuts, groupCols, "left").join(decs, groupCols, "left")
    joined
      .withColumn("__cut", coalesce(col("__cut"), lit(0L)))
      .withColumn("est", col("est") - col("__cut"))
      .filter(col("est") > 0L)
      .withColumn("err_bound",
        coalesce(col("__da"), lit(0L)) + coalesce(col("__db"), lit(0L)) +
          col("__cut"))
      .drop("__cut", "__da", "__db")
      .select(groupCols.map(col) ++
        Seq(col("item"), col("est"), col("err_bound")): _*)
  }
}
