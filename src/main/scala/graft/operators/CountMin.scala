package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch state tables (Cormode & Muthukrishnan 2005) — the
  * mergeable POINT-FREQUENCY companion to the distinct-count
  * ([[SketchState]]), heavy-hitter ([[HeavyHitters]]) and quantile
  * ([[QuantileSketch]]) state families: "how often did THIS item occur"
  * over an unbounded key domain, answered from `depth × width` counters
  * instead of a corpus-sized exact count table.
  *
  * The 100 TB pattern: an exact per-URL / per-token frequency table over
  * a crawl is itself crawl-sized — billions of rows shuffled and stored
  * to answer point lookups. The CM state is a few thousand rows TOTAL
  * (depth·width counters), built with one map-side-combined aggregation,
  * and merges across ingest batches by plain counter addition (sum is
  * associative + commutative, so per-batch states fold into exactly the
  * state a full rebuild would produce — same contract as
  * [[SketchState.merge]]). Estimates never under-count; they over-count
  * by at most ε·N with probability 1−δ for width = ⌈e/ε⌉, depth =
  * ⌈ln 1/δ⌉ — and the estimate is a pure function of the item MULTISET
  * (md5 row-hashes, order- and partitioning-independent), so reruns
  * agree bit-for-bit and a DuckDB oracle can replay the exact counters.
  *
  * Hashing is md5-derived (first 8 hex chars → bucket) rather than
  * xxhash64 for engine portability — the same determinism rule as
  * `Dedup.simhashPairsMd5`. Build cost is one extra md5 per item per
  * row; the aggregation output is bounded by depth·width regardless of
  * corpus size, so the shuffle is a few KiB.
  *
  * Reference analogue: fastETL has no sketch family; its audit layer
  * re-counts exactly per load (`fastetl/custom_functions/utils/
  * load_info.py`). This operator is the scale path a 100 TB pipeline
  * needs for the same "how much of X landed" questions.
  */
object CountMin {

  /** Row hash: bucket of `item` under hash row `seed`, both engines
    * replayable — md5(item ":" seed), first 32 bits, mod width. */
  private def bucket(item: Column, seed: Column, width: Int): Column =
    pmod(
      conv(substring(md5(concat_ws(":", item, seed.cast("string"))), 1, 8),
        16, 10).cast("long"),
      lit(width.toLong))

  /** Build CM state for one corpus (or one ingest batch): one row per
    * touched (seed, bucket) with the summed occurrence weight. Null
    * items are dropped (same contract as [[SketchState.build]]).
    * `weightCol` defaults to occurrence counting. */
  def build(df: DataFrame, itemCol: String, depth: Int = 4,
      width: Int = 4096, weightCol: Option[String] = None): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    val wt = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    df.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("item"), wt.as("wt"))
      .select(col("item"), col("wt"),
        explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .groupBy(col("seed"), bucket(col("item"), col("seed"), width).as("bucket"))
      .agg(sum(col("wt")).as("counter"))
  }

  /** Fold a batch's state into stored state: counters for the same cell
    * add, new cells pass through. The shuffle is state-sized
    * (≤ depth·width rows per side), never corpus-sized. */
  def merge(stored: DataFrame, batch: DataFrame): DataFrame =
    stored.unionByName(batch)
      .groupBy(col("seed"), col("bucket"))
      .agg(sum(col("counter")).as("counter"))

  /** Point estimates for a probe set: min over hash rows of the cell
    * counter (0 for a never-touched cell). `depth`/`width` must match
    * the build. The state is broadcast — it is bounded by depth·width
    * rows by construction — so probing is shuffle-free on the probe
    * side until the final per-item min. */
  def estimate(state: DataFrame, items: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    val probes = items.select(col(itemCol)).distinct()
      .select(col(itemCol),
        explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .withColumn("bucket",
        bucket(col(itemCol).cast("string"), col("seed"), width))
    probes.join(broadcast(state), Seq("seed", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("counter"), lit(0L))).as("est"))
  }
}
