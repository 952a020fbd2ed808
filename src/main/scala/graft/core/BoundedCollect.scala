package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** Guarded driver-side collect for "small by contract" frames.
  *
  * Several operators finish driver-side over a frame that is bounded by
  * its DEFINITION, not by the corpus — a contingency-cell table (r·c
  * rows for genuine categoricals), a reliability bin table (≤ bins
  * rows), a Gram matrix (dim² entries). The collect is correct there,
  * but a caller who violates the contract (e.g. passes a
  * high-cardinality id column as a "categorical") would otherwise get
  * an UNBOUNDED driver collect and an executor-sized OOM instead of an
  * error.
  *
  * `rows` makes the bound structural: it collects through
  * `limit(maxRows + 1)` — so driver memory is capped by construction,
  * whatever the input — and fails fast with the contract message when
  * the limit row arrives. When it returns, the limit provably dropped
  * nothing (≤ maxRows rows came back), so the result is the complete
  * frame.
  */
object BoundedCollect {

  /** Default ceiling for contingency-style collects: far above any
    * genuine categorical cross (1000×1000 categories) and far below
    * driver-heap danger for slim rows. */
  val DefaultMaxCells: Int = 1000000

  /** Collect `df` requiring ≤ `maxRows` rows; `what` names the contract
    * in the failure message (e.g. "cramersV contingency cells"). */
  def rows(df: DataFrame, maxRows: Int, what: String): Array[Row] = {
    require(maxRows > 0, s"maxRows must be > 0, got $maxRows")
    val got = df.limit(maxRows + 1).collect()
    if (got.length > maxRows) throw new IllegalArgumentException(
      s"$what exceeds the bounded-collect contract: more than $maxRows " +
        s"rows — this operator is for frames that are small by " +
        s"definition (categorical cells, fixed bins); a high-cardinality " +
        s"input violates that contract. Reduce cardinality upstream " +
        s"(bucket/discretize) or use a distributed form.")
    got
  }
}
