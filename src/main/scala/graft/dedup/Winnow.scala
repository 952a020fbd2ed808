package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.{TextFunctions, WinnowExpr}

/** Partial-overlap (containment) detection via winnowing fingerprints —
  * the capability the whole-doc near-dup families (minhash / simhash /
  * n-gram Jaccard) do not provide: "document B quotes a large chunk of
  * document A" scores near zero on whole-doc Jaccard when A and B differ
  * in length, but the shared chunk's winnowed fingerprints collide
  * exactly. Reference scope: beyond-reference LLM-pipeline layer (the
  * quote/boilerplate-containment stage of web-corpus curation).
  *
  * Pipeline shape (the 100 TB design):
  *  1. [[signatures]] — per-doc, map-side only: one codegen'd pass
  *     ([[graft.functions.WinnowExpr]]) computes the winnowed (pos, fp)
  *     set; signature size is ~2/(w+1) of the k-gram count, so the
  *     exploded table is a small fraction of the corpus.
  *  2. [[containmentPairs]] — ONE equi-join on fp. Corpus-frequent
  *     fingerprints (site boilerplate shared by thousands of docs) would
  *     square the join fan-out, so fps appearing in more than `maxDf`
  *     docs are dropped first — the stop-shingle treatment from
  *     [[Dedup.ngramJaccardPairsPrefix]]; with maxDf >= the largest real
  *     duplicate-cluster size the screen stays lossless for those pairs.
  *  3. Containment scores are exact per surviving pair: shared distinct
  *     fps over each side's distinct-fp count.
  *
  * Guarantee inherited from winnowing: a verbatim shared substring of
  * length >= w + k - 1 chars (post-normalization) contributes at least
  * one shared fingerprint, so sufficiently long quotes are always
  * screened in.
  */
object Winnow {

  /** Exploded winnowing signature: (id, pos, fp), 0-based k-gram pos over
    * the normalized text (lowercased, whitespace-collapsed). */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame =
    docs.select(col(idCol),
        explode(WinnowExpr.winnow_fingerprints(
          TextFunctions.normalize(col(textCol)), k, w)).as("sel"))
      .select(col(idCol), col("sel.pos").as("pos"), col("sel.fp").as("fp"))

  /** Distinct fingerprint set per doc, as (id, fp) rows. Winnowing can
    * select the same hash at several positions; containment is over the
    * distinct-fp multiset collapsed to a set. */
  def signatureSets(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame =
    signatures(docs, idCol, textCol, k, w)
      .select(col(idCol), col("fp")).distinct()

  /** Symmetric containment pairs: for every unordered doc pair sharing at
    * least one (df-screened) fingerprint, the shared distinct-fp count and
    * both directional containments; rows where neither direction reaches
    * `threshold` are dropped.
    *
    * `containment_a` = |shared| / |sig(a)| — the fraction of a's signature
    * found in b (a "is contained in" b when near 1), and symmetrically
    * `containment_b`. Whole-doc near-dups score high on both; a quote of
    * a inside a much larger b scores high on `containment_a` only.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, threshold: Double, maxDf: Long,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sets = scope.retain(signatureSets(docs, idCol, textCol, k, w))
    val sizes = sets.groupBy(col(idCol))
      .agg(count(lit(1)).as("sig_size"))
    // Stop-fingerprint screen: corpus-wide df per fp, computed on the
    // distinct (id, fp) table — one aggregation, never the raw text. The
    // hot-fp table is tiny (only fps shared by > maxDf docs), so AQE
    // broadcasts the anti-join; the fp shuffle of `kept` is the same
    // partitioning the pair self-join needs.
    val hot = sets.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("fp"))
    val kept = sets.join(hot, Seq("fp"), "left_anti")
    val a = kept.select(col(idCol).as("id_a"), col("fp"))
    val b = kept.select(col(idCol).as("id_b"), col("fp"))
    val shared = a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col(idCol).as("id_a"), col("sig_size").as("size_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sig_size").as("size_b")), Seq("id_b"))
      .withColumn("containment_a",
        col("n_shared").cast("double") / col("size_a").cast("double"))
      .withColumn("containment_b",
        col("n_shared").cast("double") / col("size_b").cast("double"))
      .filter(col("containment_a") >= threshold || col("containment_b") >= threshold)
      .select("id_a", "id_b", "n_shared", "size_a", "size_b",
        "containment_a", "containment_b")
  }

  /** Incremental ingest: containment pairs TOUCHING a new batch —
    * batch-internal plus batch-vs-stored — against a persisted
    * signature-set table (`signatureSets` output, one (id, fp) row per
    * distinct fingerprint; ids must not overlap the batch). Appending
    * the batch's sets to the state table after each ingest and unioning
    * the emitted pairs reproduces exactly the full-corpus
    * [[containmentPairs]] at the same `maxDf` — PROVIDED no fingerprint
    * crosses the hot threshold between ingests (the df screen here is
    * over stored ∪ batch, so a fp that later turns hot would have been
    * counted in earlier rounds; either size maxDf above the real
    * duplicate-cluster ceiling, or re-screen periodically). The
    * equivalence is spec-pinned for the no-hot-crossing regime.
    *
    * Join work per ingest is |batch sigs| × matching stored fps — never
    * stored × stored; the state table is only re-aggregated for df and
    * sizes (signature-sized, not corpus-sized). */
  def containmentPairsAgainst(storedSets: DataFrame, batchSets: DataFrame,
      idCol: String, threshold: Double, maxDf: Long): DataFrame = {
    val all = storedSets.select(col(idCol), col("fp"))
      .withColumn("__stored", lit(true))
      .unionByName(batchSets.select(col(idCol), col("fp"))
        .withColumn("__stored", lit(false)))
    val sizes = all.groupBy(col(idCol)).agg(count(lit(1)).as("sig_size"))
    val hot = all.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("fp"))
    val keptAll = all.join(hot, Seq("fp"), "left_anti")
    val keptBatch = keptAll.filter(!col("__stored"))
    val shared = keptBatch.select(col(idCol).as("id_x"), col("fp"))
      .join(keptAll.select(col(idCol).as("id_y"), col("fp"),
        col("__stored").as("y_stored")), Seq("fp"))
      // batch-batch pairs once via id order; batch-stored pairs once by
      // construction (the x side ranges over the batch only)
      .filter(col("y_stored") || col("id_x") < col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col(idCol).as("id_a"),
        col("sig_size").as("size_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"),
        col("sig_size").as("size_b")), Seq("id_b"))
      .withColumn("containment_a",
        col("n_shared").cast("double") / col("size_a").cast("double"))
      .withColumn("containment_b",
        col("n_shared").cast("double") / col("size_b").cast("double"))
      .filter(col("containment_a") >= threshold ||
        col("containment_b") >= threshold)
      .select("id_a", "id_b", "n_shared", "size_a", "size_b",
        "containment_a", "containment_b")
  }
}
