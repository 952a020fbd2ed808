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
    * `oldDocs`), `changed` (both, different content fingerprint —
    * null-safe, so a document whose text became NULL, or stopped being
    * NULL, counts as changed, and NULL-in-both is unchanged).
    *
    * Precondition: the id is unique within each snapshot (the usual
    * crawl contract). A duplicated id fans out through the full-outer
    * join and yields one status row per (old copy, new copy) pairing —
    * dedupe snapshots first (`Dedup.exactDedup` or keep-first) if the
    * source can repeat ids. */
  def diff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence is a dedicated indicator — the fingerprint can be NULL
    // for NULL text, so fp-nullness must NOT double as the presence test
    val o = oldDocs.select(col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("__fp_old"),
      lit(true).as("__in_old"))
    val n = newDocs.select(col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("__fp_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit(Added))
          .when(col("__in_new").isNull, lit(Removed))
          .when(!(col("__fp_old") <=> col("__fp_new")), lit(Changed)))
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }

  /** The new snapshot's rows that downstream stages must process, given
    * an already-computed [[diff]]: the `added` and `changed` documents
    * with their full columns. A left-semi join keyed on the id — the
    * diff side is small relative to the corpus (AQE broadcasts it when
    * it proves so), and the corpus side is never widened. */
  def changedRows(d: DataFrame, newDocs: DataFrame,
      idCol: String): DataFrame =
    newDocs.join(
      d.filter(col("status") =!= Removed).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Convenience form computing the diff itself. Callers that also need
    * the statuses (e.g. to evict removed/changed ids from stored dedup
    * state) should compute [[diff]] once and use the overload above —
    * this form pays the snapshot comparison for its own use only. */
  def changedRows(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    changedRows(diff(oldDocs, newDocs, idCol, textCol), newDocs, idCol)
}
