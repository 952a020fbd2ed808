package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-stream sequence packing — the pretraining batch-assembly
  * primitive: documents are concatenated per shard in a deterministic
  * order and the stream is chunked into fixed token-budget packs; each
  * document is addressed by the pack where it starts and its offset
  * inside it (documents may straddle pack boundaries, exactly like
  * concatenate-and-chunk pretraining tokenization).
  *
  * Everything is relational and deterministic: shard = md5-hash bucket
  * of the id (engine-portable, partitioning-independent — same property
  * as Sampling), order = id within shard, position = exclusive prefix
  * sum of token counts (one window sort per shard). Shards are the
  * parallelism unit: at 100 TB you pick shards >> executors and each
  * pack's contents are reproducible on any cluster size or engine.
  */
object Packing {

  /** Assign each document a (shard, pack_id, offset_in_pack) under a
    * fixed `budget` tokens per pack. `tokenCol` holds per-doc token
    * counts. Returns the input id plus shard/n_tokens/start_offset/
    * pack_id/offset_in_pack (start_offset = position of the doc's first
    * token in its shard's concatenated stream). */
  def streamPacking(
      docs: DataFrame, idCol: String, tokenCol: String,
      shards: Int, budget: Long): DataFrame = {
    require(shards > 0 && budget > 0, "shards and budget must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", Sampling.hashBucket(col(idCol), shards))
      .withColumn("start_offset",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"start_offset div ${budget}L"))
      .withColumn("offset_in_pack", col("start_offset") % budget)
      .select(col(idCol), col("shard"), col(tokenCol).as("n_tokens"),
        col("start_offset"), col("pack_id"), col("offset_in_pack"))
  }
}
