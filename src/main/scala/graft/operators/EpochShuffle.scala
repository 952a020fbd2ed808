package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-epoch training-order shuffle: every row gets a
  * (shard, pos) for epoch e, derived ONLY from md5(epoch ":" id) — so
  * the permutation is reproducible across reruns, partitionings, and
  * engines (no rand(), no zipWithIndex), changes completely between
  * epochs, and any shard can be regenerated independently for a resumed
  * training job.
  *
  * Scale shape: the hash + shard assignment is map-side; the only
  * exchange is the per-shard sort for `pos` (row_number partitioned by
  * shard). Shard count is the parallelism knob — size it so one shard's
  * rows fit a task's sort budget (the same contract as any
  * repartition-by-key write), which a training export wants anyway: one
  * output file per shard.
  */
object EpochShuffle {

  /** Output: input columns + shard (long in [0, nShards)) + pos (long,
    * 1-based order within shard). Ordering key is the full md5 hex (ties
    * broken by id, for ids colliding on the full digest — practically
    * never, but the determinism contract shouldn't hinge on it). */
  def assign(df: DataFrame, idCol: String, epoch: Long,
             nShards: Int): DataFrame = {
    // A null id has no deterministic place in any permutation (and
    // concat_ws would silently hash the bare epoch, colliding every
    // null row) — fail loudly instead of shuffling garbage.
    val id = when(col(idCol).isNull,
        raise_error(lit(s"EpochShuffle: null $idCol — ids must be non-null")))
      .otherwise(col(idCol).cast("string"))
    val ekey = concat_ws(":", lit(epoch.toString), id)
    val w = Window.partitionBy(col("shard")).orderBy(col("__md5"), col(idCol))
    df.withColumn("__md5", md5(ekey))
      .withColumn("shard",
        conv(substring(col("__md5"), 1, 6), 16, 10).cast("long") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__md5")
  }
}
