package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source↔destination reconciliation: after any sync (full copy,
  * incremental merge, CDC stream), classify every key as ok / mismatch /
  * missing_dst / missing_src — the audit a load pipeline runs to prove
  * the copy, and the reference's row-count probes generalized to
  * content.
  *
  * Scale shape: each side is reduced map-side to (key, fingerprint)
  * before the join — the fingerprint is one md5 over the concatenated
  * null-tagged value columns, so the shuffle carries two slim columns
  * per row instead of the full width, and the full-outer join on key is
  * the only exchange. Value-level drill-down happens AFTER
  * classification on the (usually tiny) mismatch subset, by re-joining
  * the originals — never paid on the matched bulk.
  */
object Reconcile {

  /** Null-safe row fingerprint over `cols` (order-sensitive). Each
    * column renders as a SELF-DELIMITING block — "n;" for null,
    * "v<len>:<value>" otherwise — so adjacent values can never
    * re-segment into the same byte stream: ("a","1b") encodes
    * "v1:av2:1b" while ("a1","b") encodes "v2:a1v1:b". (A bare
    * presence tag + value concat is ambiguous exactly there.) */
  private def fingerprint(cols: Seq[String]) = {
    val blocks = cols.map { c =>
      val s = col(c).cast("string")
      when(col(c).isNull, lit("n;"))
        .otherwise(concat(lit("v"), length(s), lit(":"), s))
    }
    md5(concat(blocks: _*))
  }

  /** Per-key diff classification.
    * @param keyCols join key (must be unique per side — enforce upstream)
    * @param compareCols value columns to fingerprint; default = all
    *                    shared non-key columns, in src column order.
    * Output: keyCols*, status ('ok' | 'mismatch' | 'missing_dst' |
    * 'missing_src'). */
  def diff(src: DataFrame, dst: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else src.columns.filterNot(keyCols.contains)
        .filter(dst.columns.contains).toSeq
    val s = src.select(keyCols.map(col) :+ fingerprint(cols).as("__fp_s"): _*)
    val d = dst.select(keyCols.map(col) :+ fingerprint(cols).as("__fp_d"): _*)
    s.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__fp_s").isNull, lit("missing_src"))
          .when(col("__fp_d").isNull, lit("missing_dst"))
          .when(col("__fp_s") === col("__fp_d"), lit("ok"))
          .otherwise(lit("mismatch")).as("status"): _*)
  }

  /** Aggregate form: one row per status with its key count — the audit
    * summary a scheduler alerts on. */
  def summary(src: DataFrame, dst: DataFrame, keyCols: Seq[String],
              compareCols: Seq[String] = Nil): DataFrame =
    diff(src, dst, keyCols, compareCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n_keys"))

  /** Snapshot-diff CDC: turn two full snapshots (old, new) into a
    * changelog of inserts / updates / deletes — what a pipeline feeds a
    * merge sink when the source system offers no change stream. Rows are
    * the NEW snapshot's values for I and U, the OLD snapshot's for D.
    *
    * Same slim-shuffle shape as [[diff]]: both sides reduce to
    * (key, fingerprint) first, the full-outer join classifies, and only
    * the changed minority re-joins its originating snapshot for payload —
    * unchanged keys (the bulk, in steady state) never move their width.
    */
  def changelog(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
                compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldSnap.columns.filterNot(keyCols.contains)
        .filter(newSnap.columns.contains).toSeq
    val classified = diff(oldSnap, newSnap, keyCols, compareCols)
      .withColumn("op",
        when(col("status") === "missing_src", lit("I")) // only in new
          .when(col("status") === "missing_dst", lit("D")) // only in old
          .when(col("status") === "mismatch", lit("U")))
      .filter(col("op").isNotNull)
      .select(keyCols.map(col) :+ col("op"): _*)
    val fromNew = classified.filter(col("op") =!= "D")
      .join(newSnap.select((keyCols ++ cols).map(col): _*), keyCols)
    val fromOld = classified.filter(col("op") === "D")
      .join(oldSnap.select((keyCols ++ cols).map(col): _*), keyCols)
    fromNew.unionByName(fromOld)
      .select((keyCols.map(col) :+ col("op")) ++ cols.map(col): _*)
  }

  /** Order-independent table signature: ONE row `(n_rows, sig)` where
    * `sig` is the sum of a 48-bit integer folded from each row's
    * fingerprint — commutative/associative, so it needs no sort, no
    * global shuffle beyond a scalar aggregate, and two tables (or the
    * same table before/after a migration, on different engines, under
    * different partitionings) can be compared by two numbers instead of
    * a row-level diff. 48 bits per row keeps the sum inside a long for
    * corpora up to ~2^15 times 2^48 rows; a matching signature is strong
    * evidence, a differing one is proof.
    *
    * Cross-engine caveat: the fingerprint renders values via CAST AS
    * STRING, which is engine-identical for strings, integers, decimals,
    * and dates but NOT for doubles — fix doubles to decimal upstream
    * when the signature must replay elsewhere. */
  def signature(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "signature needs at least one column")
    df.select(fingerprint(cols).as("__fp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(conv(substring(col("__fp"), 1, 12), 16, 10).cast("long"))
          .as("sig"))
  }
}
