package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata structs, plus
  * decode/feature/frame-sample operators.
  *
  * IMAGE decode is REAL: [[imageStats]] runs the JDK's `javax.imageio`
  * (PNG/JPEG/BMP/GIF — zero external dependencies) on the executor via
  * a native Catalyst expression, yielding dimensions, channel means and
  * a 64-bit average hash that feeds the
  * [[graft.similarity.BinaryQuantize.hamming]] near-dup screen; the
  * same kernel has an oracle-replayable raw-frame twin
  * ([[rgbFrameStats]], gated by `q_frame_stats`). AUDIO decode is real
  * too ([[AudioCore]]: RIFF/WAVE PCM via [[AudioExpr.audio_stats]]),
  * and VIDEO containers parse through [[VideoCore]] (RIFF/AVI:
  * uncompressed DIB and MJPEG frames through the SAME image kernel);
  * codecs beyond those (H.264 etc.) degrade to NULL — the relational
  * shape ([[withMediaMeta]], [[sampleFrames]]) carries them as opaque
  * rows.
  */
object MultimodalOps {

  /** Metadata struct carried next to every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** Wrap a binary column with SYNTHESIZED metadata, deterministic from
    * the payload size — the oracle-portable twin of [[withImageMeta]]
    * (length arithmetic is what a SQL oracle can reconstruct; q_frames
    * gates it). Use [[withImageMeta]] when payloads are real images. */
  def withMediaMeta(df: DataFrame, binCol: String, mediaType: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      (length(col(binCol)) % 1280 + 64).cast("int").as("width"),
      (length(col(binCol)) * 7 % 720 + 64).cast("int").as("height"),
      (length(col(binCol)).cast("long") * 997 % 30000 + 1000).as("duration_ms"),
      lit("synthesized").as("codec")))

  /** REAL metadata from the payload itself: ImageIO header decode
    * ([[ImageExpr.image_stats]]) supplies width/height; undecodable
    * payloads get NULL dimensions and codec 'undecodable' so quarantine
    * routing stays relational. Pure map projection. */
  def withImageMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("__st", ImageExpr.image_stats(col(binCol)))
      .withColumn("media_meta", struct(
        lit("image").as("media_type"),
        col("__st.width").as("width"),
        col("__st.height").as("height"),
        lit(null).cast("long").as("duration_ms"),
        when(col("__st").isNull, lit("undecodable"))
          .otherwise(lit("imageio")).as("codec")))
      .drop("__st")

  /** REAL image decode (JDK ImageIO): struct of width/height, channel
    * means, and split+packed 64-bit aHash. Undecodable blobs -> NULL
    * row, never a task failure. See [[ImageStats]]. */
  def imageStats(binCol: Column): Column = ImageExpr.image_stats(binCol)

  /** Deterministic raw-RGB frame stats from text codepoints — the same
    * [[ImageCore.stats]] kernel as [[imageStats]], with an input a SQL
    * oracle can reconstruct (driver-gated via `q_frame_stats`). */
  def rgbFrameStats(textCol: Column, w: Int, h: Int): Column =
    ImageExpr.rgb_frame_stats(textCol, w, h)

  /** REAL resize: transforms the PAYLOAD — ImageIO decode →
    * deterministic nearest-neighbour downsample into the aspect-fit
    * box → PNG re-encode ([[ImageExpr.image_resize]]) — and republishes
    * the metadata struct with the fitted dimensions (the same
    * floor(scale) arithmetic, clamped ≥ 1px like the kernel).
    * Undecodable payloads become NULL bytes while keeping their
    * recomputed metadata — quarantine routing stays relational. Pure
    * map projection: zero shuffle at any corpus size. */
  def resize(df: DataFrame, binCol: String, metaCol: String, maxW: Int,
      maxH: Int): DataFrame = {
    val w = col(s"$metaCol.width").cast("double")
    val h = col(s"$metaCol.height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    df.withColumn(binCol, ImageExpr.image_resize(col(binCol), maxW, maxH))
      .withColumn(metaCol, struct(
        col(s"$metaCol.media_type").as("media_type"),
        greatest(floor(w * scale), lit(1.0)).cast("int").as("width"),
        greatest(floor(h * scale), lit(1.0)).cast("int").as("height"),
        col(s"$metaCol.duration_ms").as("duration_ms"),
        concat(col(s"$metaCol.codec"), lit("+resized")).as("codec")))
  }

  /** aHash near-dup candidate pairs over image signatures: band the
    * 64-bit average hash (split lo/hi, as [[ImageExpr.statsType]]
    * exposes it) into 4 × 16-bit keys — images within small Hamming
    * distance share ≥ 1 exact band with high probability — then verify
    * Hamming on candidates. The image analogue of the SimHash text
    * screen (same one-shot (band_idx, band_val) equi-join; never
    * all-pairs), which is what makes a whole-corpus visual near-dup
    * sweep a single bounded shuffle at 100 TB. Output:
    * (doc_a, doc_b, hamming), a < b. */
  def ahashNearDupPairs(sigs: DataFrame, idCol: String, loCol: String,
      hiCol: String, maxHamming: Int,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    val s = scope.retain(sigs.select(
      col(idCol), col(loCol).as("__lo"), col(hiCol).as("__hi")))
    val banded = s.select(col(idCol), col("__lo"), col("__hi"),
      posexplode(array(
        col("__lo").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("__lo"), 16).bitwiseAND(lit(0xFFFFL)),
        col("__hi").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("__hi"), 16).bitwiseAND(lit(0xFFFFL))))
        .as(Seq("band_idx", "band_val")))
    val l = banded.select(col(idCol).as("doc_a"), col("__lo").as("lo_a"),
      col("__hi").as("hi_a"), col("band_idx"), col("band_val"))
    val r = banded.select(col(idCol).as("doc_b"), col("__lo").as("lo_b"),
      col("__hi").as("hi_b"), col("band_idx"), col("band_val"))
    l.join(r, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("lo_a"), col("hi_a"),
        col("lo_b"), col("hi_b"))
      .distinct()
      .withColumn("hamming",
        (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
          bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
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
