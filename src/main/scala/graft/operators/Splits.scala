package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test split assignment.
  *
  * The split key decides everything: pass a DOCUMENT key and you get a
  * plain random-looking split; pass a dedup CLUSTER key (connected
  * component, content fingerprint, URL host…) and every member of the
  * cluster lands in the SAME split — the leakage-free split a
  * deduplicated corpus needs, since near-duplicates straddling
  * train/test would leak training text into evaluation. Assignment is
  * the md5 bucket of the key ([[Sampling.hashBucket]]): stateless,
  * map-side, no shuffle, reproducible on any engine/partitioning, and
  * stable under corpus growth (a key's split never changes when other
  * documents appear — the property a refreshed corpus needs to keep its
  * eval set frozen).
  */
object Splits {

  /** Append `outCol` labelling each row with its split. `fracs` are
    * (name, fraction) in priority order and must sum to 1; boundaries
    * are computed in exact decimal from each fraction's decimal
    * rendering (0.07 * 10000 in IEEE is 699.99…, which would floor into
    * the wrong bucket — the [[Sampling.stratifiedSample]] hazard). */
  def assign(df: DataFrame, splitKey: Column, fracs: Seq[(String, Double)],
      outCol: String = "split", buckets: Int = 10000): DataFrame = {
    df.withColumn(outCol, label(splitKey, fracs, buckets))
  }

  /** The split label as a standalone Column (composable into selects). */
  def label(splitKey: Column, fracs: Seq[(String, Double)],
      buckets: Int = 10000): Column = {
    require(fracs.nonEmpty, "at least one split required")
    require(fracs.map(_._1).distinct.size == fracs.size,
      s"duplicate split names in ${fracs.map(_._1)}")
    require(fracs.forall(_._2 > 0.0), s"fractions must be > 0: $fracs")
    val total = fracs.map(f => BigDecimal(f._2.toString)).sum
    require((total - 1).abs < BigDecimal("1e-9"),
      s"fractions must sum to 1, got $total")
    val bounds = boundaries(fracs, buckets)
    // a fraction below 1/buckets floors onto its predecessor's boundary
    // (or onto 0) — the caller asked for a split that would silently
    // never receive a row; fail fast instead
    require(bounds.zip(0L +: bounds).forall { case (b, prev) => b > prev },
      s"fractions below 1/$buckets produce empty splits: $fracs -> $bounds")
    val b = Sampling.hashBucket(splitKey, buckets)
    val labelled = fracs.map(_._1).zip(bounds).dropRight(1)
      .foldRight(lit(fracs.last._1): Column) { case ((name, bnd), acc) =>
        when(b < bnd, lit(name)).otherwise(acc)
      }
    // a NULL key hashes to a NULL bucket: without the guard every
    // comparison is NULL and the fold falls through to the LAST split —
    // silently seeding the eval set with every null-keyed row. NULL key
    // => NULL label; routing is the caller's explicit decision.
    when(b.isNull, lit(null).cast("string")).otherwise(labelled)
  }

  /** Cumulative bucket boundaries in exact decimal — shared with the SQL
    * oracle so both engines cut at identical integers. */
  private[graft] def boundaries(fracs: Seq[(String, Double)],
      buckets: Int): Seq[Long] =
    fracs.scanLeft(BigDecimal(0)) { case (acc, (_, f)) =>
      acc + BigDecimal(f.toString)
    }.tail.map(c => (c * buckets).setScale(0, BigDecimal.RoundingMode.FLOOR)
      .toLong)

  /** Temporal split with an embargo gap (the purged time-series split):
    * rows at or before `trainEnd` are 'train', rows strictly after
    * `trainEnd + embargo` are 'test', and the gap between is labelled
    * 'embargo' — excluded from both sides so that features computed
    * from trailing windows at the train boundary cannot overlap test
    * observations (the leakage mode a plain cutoff split has). Null
    * timestamps get a null label. Pure map expression. */
  def timeSplit(tsCol: Column, trainEnd: java.sql.Timestamp,
      embargo: String): Column = {
    val end = lit(trainEnd).cast("timestamp")
    val testStart = end + expr(s"INTERVAL $embargo")
    when(tsCol.isNull, lit(null).cast("string"))
      .when(tsCol <= end, lit("train"))
      .when(tsCol > testStart, lit("test"))
      .otherwise(lit("embargo"))
  }
}
