package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle owner for the intermediates that operators persist.
  *
  * Several operators (Dedup signature/shingle tables, HyperplaneLSH
  * buckets, GeoPointCleaner's parsed coordinates) persist an intermediate
  * DataFrame that feeds multiple consumers of one plan. The persist is a
  * plan-shape necessity; its LIFECYCLE belongs to the caller, who knows
  * when the consuming action has run. In a long-lived session processing
  * many tables, never releasing them accumulates MEMORY_AND_DISK blocks
  * until eviction pressure or `spark.catalog.clearCache()`.
  *
  * Loan pattern — caches are released (non-blocking) when the scope
  * closes, after the consuming action:
  *
  * {{{
  * CacheScope.withScope { scope =>
  *   Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7, scope)
  *     .write.parquet(out)
  * } // <- shingle table unpersisted here
  * }}}
  *
  * Operators default to `CacheScope.session`, which intentionally never
  * releases: correct for run-to-completion jobs (the driver's Verify /
  * Bench contract, spark-submit batch jobs) where the session's end is
  * the release, and for callers that run the action lazily outside the
  * operator call. Interactive / multi-table sessions should pass an
  * explicit scope.
  */
final class CacheScope private[core] (tracking: Boolean) extends AutoCloseable {
  private val retained = ArrayBuffer.empty[DataFrame]

  /** Persist `df` at `level` and register it for release when this scope
    * closes (no-op registration on the session scope). */
  def retain(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    if (tracking) retained.synchronized { retained += p }
    p
  }

  /** Register an ALREADY-persisted DataFrame for release on close,
    * without touching its storage (used by iterative operators that
    * manage persistence round-by-round and hand off the final
    * generation). */
  private[graft] def track(df: DataFrame): DataFrame = {
    if (tracking) retained.synchronized { retained += df }
    df
  }

  /** Release every retained cache (non-blocking — Spark reclaims blocks
    * asynchronously; subsequent jobs recompute from lineage). */
  override def close(): Unit = retained.synchronized {
    retained.foreach(_.unpersist(blocking = false))
    retained.clear()
  }
}

object CacheScope {
  /** Session-lifetime scope: persists are never released by graft (the
    * SparkSession's own shutdown or `spark.catalog.clearCache()` is the
    * release). The default for every persisting operator. */
  val session: CacheScope = new CacheScope(tracking = false)

  /** Run `f` with a fresh scope; release its caches on exit (also on
    * failure). The consuming action must run inside `f` — the result of a
    * lazy transformation that escapes the scope will recompute its
    * unpersisted intermediates from lineage (correct, just slower). */
  def withScope[A](f: CacheScope => A): A = {
    val scope = new CacheScope(tracking = true)
    try f(scope) finally scope.close()
  }
}
