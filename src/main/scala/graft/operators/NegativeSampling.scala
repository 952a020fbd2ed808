package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive / embedding training:
  * for every anchor row, k pseudo-random partners drawn from the corpus —
  * reproducible across reruns, partitionings, and engines (no `rand()`),
  * like `EpochShuffle` but producing PAIRS instead of an order.
  *
  * Scheme: hash-bucket the corpus (`md5(id) mod nBuckets`), ring-order
  * each bucket by the full md5 hex (`row_number` per bucket — the window
  * partitions by bucket, so the sort shuffles only bucket-sized groups,
  * never a global single-partition window), then for draw j the partner
  * of the row at position p is the row at position
  * `1 + (p - 1 + off_j) mod n` in the same bucket, with
  * `off_j = 1 + (md5(id:j) mod (n-1))` — off_j ∈ [1, n-1] guarantees a
  * partner ≠ anchor. Buckets are themselves random (md5), so in-bucket
  * draws are corpus-uniform in distribution; one equi-join on
  * (bucket, position) materializes the pairs.
  *
  * Distinct draws j can collide on the same partner (sampling WITH
  * replacement, standard for negative sampling). Buckets with a single
  * row yield no negatives (n - 1 = 0); size `nBuckets` ≈ corpus/10⁴ so
  * buckets are large and this never happens in practice.
  */
object NegativeSampling {

  private def hexFold(c: org.apache.spark.sql.Column) =
    conv(substring(c, 1, 6), 16, 10).cast("long")

  /** Returns (anchor_id, draw, neg_id). `idCol` values must be distinct
    * and castable to string. */
  def ringNegatives(df: DataFrame, idCol: String, k: Int,
      nBuckets: Int): DataFrame = {
    require(k >= 1 && nBuckets >= 1, s"bad k=$k nBuckets=$nBuckets")
    val ring = df.select(col(idCol))
      .withColumn("__md5", md5(col(idCol).cast("string")))
      .withColumn("__b", pmod(hexFold(col("__md5")), lit(nBuckets)))
    val w = Window.partitionBy(col("__b")).orderBy(col("__md5"), col(idCol))
    val posed = ring
      .withColumn("__pos", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__b"))))
    val anchors = posed.filter(col("__n") > 1)
      .withColumn("draw", explode(sequence(lit(1), lit(k))))
      .withColumn("__off",
        lit(1) + pmod(
          hexFold(md5(concat_ws(":", col(idCol), col("draw")))),
          col("__n") - 1))
      .withColumn("__negpos",
        lit(1) + pmod(col("__pos") - 1 + col("__off"), col("__n")))
    anchors.alias("a")
      .join(posed.alias("p"),
        col("a.__b") === col("p.__b") && col("a.__negpos") === col("p.__pos"))
      .select(col(s"a.$idCol").as("anchor_id"), col("a.draw"),
        col(s"p.$idCol").as("neg_id"))
  }
}
