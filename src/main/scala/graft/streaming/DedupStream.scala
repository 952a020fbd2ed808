package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming exact deduplication — the continuous-ingest form of
  * `Dedup.exactDedup`: drop any document whose content fingerprint was
  * already seen.
  *
  * State discipline is the whole design problem at 100 TB/day:
  *  - `dedupForever` keeps every fingerprint in state — exact across all
  *    time, but state grows with the corpus; only for bounded key spaces.
  *  - `dedupWithinWatermark` bounds state with an event-time watermark
  *    (`dropDuplicatesWithinWatermark`): duplicates arriving within the
  *    watermark window are dropped, state for older fingerprints is
  *    evicted. The correct production default — exactness within the
  *    reordering horizon, bounded memory — paired with a periodic batch
  *    `Dedup.exactDedup` sweep for cross-horizon duplicates.
  *
  * Both operate on `fingerprint(text)` (md5 of normalized text,
  * TextFunctions.scala) so the state rows are 32-byte keys, not
  * documents.
  */
object DedupStream {

  /** Fingerprint projection shared by both modes (and by the batch
    * sweep, so stream + batch agree on what "duplicate" means). */
  def withFingerprint(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("fp", TextFunctions.fingerprint(col(textCol)))

  /** Exact-across-all-time streaming dedup (unbounded state). */
  def dedupForever(docs: DataFrame, textCol: String): DataFrame =
    withFingerprint(docs, textCol).dropDuplicates("fp")

  /** Watermark-bounded streaming dedup: duplicates within the event-time
    * watermark window are dropped; state is evicted as the watermark
    * advances. `eventTimeCol` must be the stream's event-time column. */
  def dedupWithinWatermark(
      docs: DataFrame, textCol: String, eventTimeCol: String,
      watermarkDelay: String): DataFrame =
    withFingerprint(docs, textCol)
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
}
