package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time bounded stream-stream inner join — the attribution shape
  * (click -> conversion within a window) that batch pipelines express as
  * an interval self-join and continuous pipelines need as a join of two
  * live streams.
  *
  * State discipline: BOTH sides carry watermarks and the join condition
  * bounds the right event time to [left, left + window], so Spark can
  * evict join state as the watermark passes — state is proportional to
  * (stream rate x (window + watermark delay)), never to stream length.
  * An unbounded condition would accumulate both streams forever; this
  * operator refuses to build one by construction.
  */
object StreamJoin {

  /** Left rows joined to right rows with equal keys whose event time
    * falls within [leftTime, leftTime + window]. Works identically on
    * static frames (the batch oracle) and streaming frames (where the
    * watermark bounds state). Column names must be disjoint apart from
    * the keys (rename upstream, as with any self-join).
    *
    * @param window  SQL interval literal body, e.g. "4 hours"
    * @param watermarkDelay max expected event-time disorder, e.g. "1 hour"
    */
  def attributionJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      window: String, watermarkDelay: String): DataFrame = {
    val l =
      if (left.isStreaming) left.withWatermark(leftTime, watermarkDelay)
      else left
    val r =
      if (right.isStreaming) right.withWatermark(rightTime, watermarkDelay)
      else right
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTime) >= l(leftTime) &&
        r(rightTime) <= l(leftTime) + expr(s"INTERVAL $window"))
  }

  /** LEFT OUTER variant: left rows that never find an in-window partner
    * are still emitted, null-padded — the "clicks that did not convert"
    * report as a stream. Outer semantics in streaming are
    * watermark-DELAYED by construction: the null-padded row can only be
    * emitted once the watermark proves no future partner can arrive (the
    * left row's state expired), so unmatched rows surface
    * (window + watermarkDelay) of event time after their own timestamp.
    * Same bounded-state discipline as the inner form. */
  def attributionJoinOuter(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      window: String, watermarkDelay: String): DataFrame = {
    val l =
      if (left.isStreaming) left.withWatermark(leftTime, watermarkDelay)
      else left
    val r =
      if (right.isStreaming) right.withWatermark(rightTime, watermarkDelay)
      else right
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTime) >= l(leftTime) &&
        r(rightTime) <= l(leftTime) + expr(s"INTERVAL $window"),
      "left_outer")
  }
}
