package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Content diff between two corpus snapshots — the change-detection
  * primitive an incremental curation pipeline runs first: everything
  * downstream (quality rules, dedup ingest, re-embedding) only needs to
  * touch the documents this operator reports.
  *
  * The comparison key is the document id; content equality is the md5
  * content fingerprint ([[TextFunctions.fingerprint]]: normalized text),
  * so a re-crawl that only reorders whitespace or changes case is NOT a
  * change. Unchanged documents are deliberately omitted from the output:
  * at 100 TB they are the overwhelming majority, and emitting them would
  * make the diff corpus-sized when its purpose is to be small.
  *
  * One full-outer equi-join on the id — fingerprints are computed
  * map-side inside each scan, the join shuffles only (id, 32-byte hex)
  * pairs, never the text. */
object CorpusDiff {

  val Added = "added"
  val Removed = "removed"
  val Changed = "changed"

  /** (idCol, status) for every document that differs between the two
    * snapshots: `added` (id only in `newDocs`), `removed` (only in
    * `oldDocs`), `changed` (both, different content fingerprint). */
  def diff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("__fp_old"))
    val n = newDocs.select(col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("__fp_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__fp_old").isNull, lit(Added))
          .when(col("__fp_new").isNull, lit(Removed))
          .when(col("__fp_old") =!= col("__fp_new"), lit(Changed)))
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }

  /** The new snapshot's rows that downstream stages must process: the
    * `added` and `changed` documents, with their full columns. The diff's
    * (id, status) side is small and broadcastable; the corpus-sized side
    * is only semi-joined. */
  def changedRows(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val d = diff(oldDocs, newDocs, idCol, textCol)
      .filter(col("status") =!= Removed).select(col(idCol))
    newDocs.join(d, Seq(idCol), "left_semi")
  }
}
