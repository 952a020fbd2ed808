package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over [[ImageCore]] — native expressions (no UDF
  * serialization), CodegenFallback by design: decode cost dwarfs the
  * interpreted-call overhead, and keeping them expressions (not
  * mapPartitions) preserves column pruning and lets them ride inside
  * any projection. */
object ImageExpr {

  /** Shared output shape. aHash is exposed split (lo/hi, both
    * non-negative — SQL-oracle friendly, no 64-bit shifts) AND packed
    * (`ahash`, feeds [[graft.similarity.BinaryQuantize.hamming]]). */
  val statsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("ahash_lo", LongType, nullable = false),
    StructField("ahash_hi", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false)))

  private[multimodal] def toRow(s: ImageCore.Stats): InternalRow =
    InternalRow(s.width, s.height, s.meanR, s.meanG, s.meanB,
      s.ahashLo, s.ahashHi, s.ahash64)

  /** Raw-frame stats: the string's first w*h*3 codepoints (mod 256) as
    * R,G,B channels of w*h row-major pixels. NULL when too short. */
  def rgb_frame_stats(c: Column, w: Int, h: Int): Column =
    GraftShim.columnOf(RgbFrameStats(GraftShim.expressionOf(c), w, h))

  /** Real ImageIO decode of an image blob. NULL on undecodable bytes. */
  def image_stats(c: Column): Column =
    GraftShim.columnOf(ImageStats(GraftShim.expressionOf(c)))

  def image_resize(c: Column, maxW: Int, maxH: Int): Column =
    GraftShim.columnOf(ImageResize(GraftShim.expressionOf(c), maxW, maxH))

  def rgb_frame_resize_stats(c: Column, w: Int, h: Int, dw: Int,
      dh: Int): Column =
    GraftShim.columnOf(
      RgbFrameResizeStats(GraftShim.expressionOf(c), w, h, dw, dh))

  def image_crop(c: Column, cw: Int, ch: Int): Column =
    GraftShim.columnOf(ImageCrop(GraftShim.expressionOf(c), cw, ch))

  def rgb_frame_crop_stats(c: Column, w: Int, h: Int, cw: Int,
      ch: Int): Column =
    GraftShim.columnOf(
      RgbFrameCropStats(GraftShim.expressionOf(c), w, h, cw, ch))
}

/** `rgb_frame_stats(text, w, h)` — deterministic synthetic frame from a
  * string; the oracle-replayable twin of [[ImageStats]] (same
  * [[ImageCore.stats]] kernel, input DuckDB can reconstruct). */
case class RgbFrameStats(child: Expression, w: Int, h: Int)
    extends UnaryExpression with CodegenFallback {
  require(w > 0 && h > 0, s"frame dims must be positive, got ${w}x$h")

  override def dataType: DataType = ImageExpr.statsType
  override def nullable: Boolean = true // short input -> null
  override def prettyName: String = "rgb_frame_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rgb_frame_stats expects a STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    ImageCore.statsFromText(v.asInstanceOf[UTF8String].toString, w, h)
      .map(ImageExpr.toRow).orNull

  override protected def withNewChildInternal(
      newChild: Expression): RgbFrameStats = copy(child = newChild)
}

/** `rgb_frame_resize_stats(text, w, h, dw, dh)` — the resize kernel's
  * oracle-replayable twin: build the deterministic (w×h) frame from the
  * string, nearest-neighbour downsample to (dw×dh)
  * ([[ImageCore.resizeNearest]] — pure integer index arithmetic DuckDB
  * can replay), then the shared stats kernel over the thumbnail. */
case class RgbFrameResizeStats(child: Expression, w: Int, h: Int,
    dw: Int, dh: Int)
    extends UnaryExpression with CodegenFallback {
  require(w > 0 && h > 0 && dw > 0 && dh > 0,
    s"frame dims must be positive, got ${w}x$h -> ${dw}x$dh")

  override def dataType: DataType = ImageExpr.statsType
  override def nullable: Boolean = true // short input -> null
  override def prettyName: String = "rgb_frame_resize_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rgb_frame_resize_stats expects a STRING input, got " +
        child.dataType.sql)

  override protected def nullSafeEval(v: Any): Any =
    ImageCore.thumbStatsFromText(v.asInstanceOf[UTF8String].toString,
      w, h, dw, dh).map(ImageExpr.toRow).orNull

  override protected def withNewChildInternal(
      newChild: Expression): RgbFrameResizeStats = copy(child = newChild)
}

/** `rgb_frame_crop_stats(text, w, h, cw, ch)` — the crop kernel's
  * oracle-replayable twin: deterministic (w×h) frame from the string,
  * [[ImageCore.cropCenter]] (floor-centered integer offsets DuckDB can
  * replay), shared stats kernel over the crop. */
case class RgbFrameCropStats(child: Expression, w: Int, h: Int,
    cw: Int, ch: Int)
    extends UnaryExpression with CodegenFallback {
  require(w > 0 && h > 0 && cw > 0 && ch > 0,
    s"frame dims must be positive, got ${w}x$h crop ${cw}x$ch")

  override def dataType: DataType = ImageExpr.statsType
  override def nullable: Boolean = true // short input -> null
  override def prettyName: String = "rgb_frame_crop_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rgb_frame_crop_stats expects a STRING input, got " +
        child.dataType.sql)

  override protected def nullSafeEval(v: Any): Any =
    ImageCore.cropStatsFromText(v.asInstanceOf[UTF8String].toString,
      w, h, cw, ch).map(ImageExpr.toRow).orNull

  override protected def withNewChildInternal(
      newChild: Expression): RgbFrameCropStats = copy(child = newChild)
}

/** `image_stats(binary)` — real executor-side decode via the JDK's
  * ImageIO; undecodable blobs degrade to NULL (quarantine relationally
  * downstream, never kill the task). */
case class ImageStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ImageExpr.statsType
  override def nullable: Boolean = true // failed decode -> null
  override def prettyName: String = "image_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_stats expects a BINARY input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    ImageCore.decodeImage(v.asInstanceOf[Array[Byte]])
      .map(ImageExpr.toRow).orNull

  override protected def withNewChildInternal(
      newChild: Expression): ImageStats = copy(child = newChild)
}

/** `image_resize(binary, maxW, maxH)` — REAL thumbnailing: ImageIO
  * decode → deterministic nearest-neighbour downsample into the
  * aspect-fit box ([[ImageCore.resizeNearest]], integer index
  * arithmetic) → PNG re-encode. NULL on undecodable bytes, same honest
  * degradation as [[ImageStats]]. */
case class ImageResize(child: Expression, maxW: Int, maxH: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxW > 0 && maxH > 0, s"bad resize box ${maxW}x$maxH")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // failed decode -> null
  override def prettyName: String = "image_resize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_resize expects a BINARY input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    ImageCore.resizeImage(v.asInstanceOf[Array[Byte]], maxW, maxH).orNull

  override protected def withNewChildInternal(
      newChild: Expression): ImageResize = copy(child = newChild)
}

/** `image_crop(binary, cw, ch)` — REAL center-crop: ImageIO decode →
  * [[ImageCore.cropCenter]] (clamped to source dims, floor-centered
  * offsets) → PNG re-encode. NULL on undecodable bytes. */
case class ImageCrop(child: Expression, cw: Int, ch: Int)
    extends UnaryExpression with CodegenFallback {

  require(cw > 0 && ch > 0, s"bad crop box ${cw}x$ch")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // failed decode -> null
  override def prettyName: String = "image_crop"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_crop expects a BINARY input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    ImageCore.cropImage(v.asInstanceOf[Array[Byte]], cw, ch).orNull

  override protected def withNewChildInternal(
      newChild: Expression): ImageCrop = copy(child = newChild)
}
