package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: cluster a table so that parquet
  * row-group/file min-max statistics are selective on TWO columns at
  * once.
  *
  * A single-column sort gives perfect skipping on that column and none
  * on any other. Interleaving the bits of two binned keys
  * (a1 b1 a0 b0 ...) makes curve-adjacent rows close in BOTH dimensions,
  * so `repartitionByRange` + in-partition sort on the z-value yields
  * files whose [min,max] envelopes are small squares instead of
  * full-width stripes — a filter on either column prunes most files.
  * This is a write-time layout choice, free at read time; at 100 TB it
  * is the difference between scanning a stripe of the table and scanning
  * a few files.
  *
  * Everything here is a plain codegen'd Column expression (bit magic),
  * so layout cost is one range-shuffle over the data — the same price as
  * any clustered write.
  */
object ZOrder {

  /** Bin a numeric column to [0, 2^bits) given fixed bounds (callers
    * supply bounds — at scale you know them or sample them; no extra
    * pass is hidden here). Out-of-range values clamp to the ends. */
  def bin(c: Column, min: Double, max: Double, bits: Int = 16): Column = {
    require(max > min, s"bin bounds must satisfy max > min, got [$min, $max]")
    val buckets = (1L << bits) - 1
    val scaled = (c.cast("double") - lit(min)) / lit(max - min) * lit(buckets.toDouble)
    least(greatest(floor(scaled).cast("long"), lit(0L)), lit(buckets))
  }

  /** Spread the low 16 bits of `c` to even bit positions (Morton magic
    * numbers): b15..b0 -> ..b1 0 b0. */
  def spread16(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Morton z-value of two 16-bit binned keys (a in even bits, b odd). */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` on the z-curve of two numeric columns: range-partition
    * into `partitions` output slices and sort within each. Write the
    * result with any file sink; both columns' min-max stats become
    * selective. Bounds per column as (min, max). */
  def layout(
      df: DataFrame, colA: String, boundsA: (Double, Double),
      colB: String, boundsB: (Double, Double),
      partitions: Int, bits: Int = 16): DataFrame = {
    val z = zValue(
      bin(col(colA), boundsA._1, boundsA._2, bits),
      bin(col(colB), boundsB._1, boundsB._2, bits))
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Spread the low 21 bits of `c` to every third bit position (3-D
    * Morton magic): b20..b0 -> ..b1 0 0 b0. 21+21+21 = 63 bits — the
    * full signed-long budget. */
  def spread21(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0x1FFFFFL))
    x = x.bitwiseOR(shiftleft(x, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x1249249249249249L))
    x
  }

  /** Morton z-value of three 21-bit binned keys (a at bit 3i, b at
    * 3i+1, c at 3i+2) — the clustering key for THREE-column min-max
    * pruning. Same layout recipe as [[layout]]: range-partition + sort
    * on this value before the write. */
  def zValue3(a: Column, b: Column, c: Column): Column =
    spread21(a)
      .bitwiseOR(shiftleft(spread21(b), 1))
      .bitwiseOR(shiftleft(spread21(c), 2))
}
