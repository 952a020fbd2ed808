package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.operators.TopKAggregator

/** Binary (sign-bit) vector quantization: a d-dim float embedding is
  * collapsed to d sign bits packed into ⌈d/64⌉ BIGINTs — here d = 64,
  * exactly one long. Hamming distance between signatures approximates
  * angular distance (each coordinate is an axis-aligned hyperplane, the
  * degenerate-but-standard case of signed-random-projection LSH), which
  * makes the screen a single `bit_count(xor)` per candidate: a 32×
  * memory-traffic reduction over float vectors and the cheapest
  * whole-corpus scan a vector index can run. The crude screen is then
  * repaired by an exact decimal-dot rescore of the `candK` survivors —
  * the same screen-then-rescore contract as
  * [[RandomProjection.topKViaProjection]].
  *
  * 100 TB shape: signatures are one long per vector (8 bytes vs 256), the
  * query side is broadcast, the screen is a bounded top-candK AGGREGATION
  * (map-side k-buffers, no window sort of the query × corpus fan-out),
  * and only candK rows per query ever touch the float vectors again.
  */
object BinaryQuantize {

  /** (…, sig): bit i (0-based) of `sig` is set iff element i+1 of the
    * vector is > 0 — strictly positive, so a zero coordinate and a
    * negative one quantize alike on every engine (no -0.0 ambiguity:
    * -0.0 > 0 is false in both IEEE comparisons and SQL). NULL vectors
    * yield NULL, not the all-zeros signature. */
  def signature(vecCol: String, dims: Int = 64): Column = {
    require(dims >= 1 && dims <= 64, s"one packed long: need 1..64, got $dims")
    val packed = (0 until dims).map(i =>
      when(element_at(col(vecCol), i + 1) > lit(0.0f), lit(1L << i))
        .otherwise(lit(0L))).reduce(_ + _)
    when(col(vecCol).isNull, lit(null).cast("long")).otherwise(packed)
  }

  /** Packed-signature Hamming distance (0..64). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Top-k nearest corpus vectors per query by exact cosine, screened by
    * signature Hamming distance: candK Hamming candidates per query
    * (bounded aggregation over the packed longs only), then exact
    * decimal-dot rescore and final rank. Output: (query_id, rank, nn_id,
    * hamming, cos_sim) — hamming kept so screen quality is observable.
    * Larger candK trades screen cost for recall; with candK >=
    * |corpus| - 1 the result IS brute force on non-degenerate corpora
    * (ties inside the screen are broken by nn_id, so the law needs
    * candK large enough to cover the last Hamming shell). */
  def hammingTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, candK: Int, dims: Int = 64,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(k >= 1 && candK >= k, s"need candK >= k >= 1, got k=$k candK=$candK")
    val c = scope.retain(
      CosineSearch.withNormSq(corpus, vecCol)
        .select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
          col("norm_sq").as("nn_norm_sq"),
          signature(vecCol, dims).as("nn_sig")))
    val q = CosineSearch.withNormSq(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("norm_sq").as("q_norm_sq"),
        signature(vecCol, dims).as("q_sig"))

    // Hamming screen: longs only — the float vectors stay columnar-pruned
    // out of the scan. Score is -hamming so the shared top-k aggregator's
    // (score DESC, id ASC) order means (hamming ASC, id ASC).
    val screened = TopKAggregator.topKPerGroup(
      broadcast(q.select(col("query_id"), col("q_sig")))
        .crossJoin(c.select(col("nn_id"), col("nn_sig")))
        .filter(col("query_id") =!= col("nn_id"))
        .select(col("query_id"), col("nn_id"),
          (-hamming(col("q_sig"), col("nn_sig")).cast("double"))
            .as("neg_hamming")),
      Seq("query_id"), "nn_id", "neg_hamming", candK)

    val rescored = screened
      .select(col("query_id"), col("nn_id"),
        (-col("neg_hamming")).cast("long").as("hamming"))
      .join(c.select(col("nn_id"), col("nn_vec"), col("nn_norm_sq")),
        Seq("nn_id"))
      .join(q.select(col("query_id"), col("q_vec"), col("q_norm_sq")),
        Seq("query_id"))
      .withColumn("cos_sim",
        CosineSearch.cosine(
          CosineSearch.dotDecimal(col("q_vec"), col("nn_vec")),
          col("q_norm_sq"), col("nn_norm_sq")))
      .select(col("query_id"), col("nn_id"), col("hamming"), col("cos_sim"))
    TopKAggregator.topKPerGroup(rescored, Seq("query_id"), "nn_id",
        "cos_sim", k)
      .join(rescored.select(col("query_id"), col("nn_id"), col("hamming")),
        Seq("query_id", "nn_id"))
      .select(col("query_id"), col("rank"), col("nn_id"), col("hamming"),
        col("cos_sim"))
  }
}
