package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata structs, plus
  * decode/feature/frame-sample operators.
  *
  * The actual codec work is STUBBED (image/audio libraries are not in
  * this environment): `DecodeStub` produces deterministic fake features
  * from the bytes. The Spark-side contract — schema shape, partition
  * behavior, batch-wise processing — is real and tested; a production
  * deployment swaps the stub for a real codec inside the same
  * `mapPartitions`/expression seam.
  */
object MultimodalOps {

  /** Metadata struct carried next to every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** Wrap a binary column with synthesized metadata (deterministic from
    * the payload size — the stub stands in for header parsing; length
    * arithmetic keeps it portable to the SQL oracle). */
  def withMediaMeta(df: DataFrame, binCol: String, mediaType: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      (length(col(binCol)) % 1280 + 64).cast("int").as("width"),
      (length(col(binCol)) * 7 % 720 + 64).cast("int").as("height"),
      (length(col(binCol)).cast("long") * 997 % 30000 + 1000).as("duration_ms"),
      lit("stub").as("codec")))

  /** STUB decode: a "feature vector" derived deterministically from the
    * payload hash. Replace with a real codec (same signature) in
    * production — the pipeline shape does not change. */
  def decodeStub(binCol: Column, dims: Int): Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => pmod(xxhash64(binCol, i), lit(1000)).cast("double") / lit(1000.0))

  /** STUB resize: recomputes the metadata struct for a target box
    * (aspect-preserving fit) and marks the payload as resized. A real
    * implementation transforms the bytes in the same projection seam. */
  def resizeStub(df: DataFrame, metaCol: String, maxW: Int, maxH: Int): DataFrame = {
    val w = col(s"$metaCol.width").cast("double")
    val h = col(s"$metaCol.height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    df.withColumn(metaCol, struct(
      col(s"$metaCol.media_type").as("media_type"),
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      col(s"$metaCol.duration_ms").as("duration_ms"),
      concat(col(s"$metaCol.codec"), lit("+resized")).as("codec")))
  }

  /** Frame sampling for video-like media: one output row per sampled
    * frame index (every `stepMs` across the duration). Pure relational
    * explode — this is the real scale mechanism (a 10-minute video at
    * 1 fps becomes 600 rows processed independently downstream). */
  def sampleFrames(
      df: DataFrame, idCol: String, metaCol: String, stepMs: Long): DataFrame =
    df.select(col(idCol), col(s"$metaCol.duration_ms").as("duration_ms"))
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(stepMs))))
      .withColumn("frame_idx", (col("frame_ms") / stepMs).cast("long"))
      .select(col(idCol), col("frame_idx"), col("frame_ms"))
}
