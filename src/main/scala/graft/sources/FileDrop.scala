package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remote file-drop selection — the Bacen STA pattern
  * (hooks/bacen_STA_hook.py:72-129): list available files in a window,
  * pick the newest by availability timestamp, fetch it. The HTTP/XML
  * transport is a `DropListing` trait; the newest-file argmax is the
  * relational `max_by` the reference hand-rolls.
  */
object FileDrop {

  final case class Entry(protocol: String, name: String,
      availableAt: java.sql.Timestamp)

  trait DropListing extends Serializable {
    def list(from: java.sql.Timestamp, to: java.sql.Timestamp): Seq[Entry]
  }

  /** Newest entry in the window (bacen_STA_hook.py:96-106's argmax),
    * expressed relationally so it also works over a listing DataFrame. */
  def newest(spark: SparkSession, listing: DropListing,
      from: java.sql.Timestamp, to: java.sql.Timestamp): Option[Entry] = {
    import spark.implicits._
    val df = listing.list(from, to).toDF()
    if (df.isEmpty) None
    else {
      val row = df.agg(
        max_by(struct(col("protocol"), col("name"), col("availableAt")),
          col("availableAt")).as("e"))
        .select("e.*").as[Entry].collect()
      row.headOption
    }
  }
}
