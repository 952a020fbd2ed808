package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string column — the corpus-quality
  * signal Gopher-family pipelines use as a cheap redundancy detector:
  * boilerplate, templated spam, and repeated spans compress far below
  * natural prose, while high-entropy noise (minified JS, base64 blobs)
  * compresses above it. One number per document, computed in a map-only
  * pass, filterable from both ends.
  *
  * `compress_ratio(text)` = deflated bytes / raw UTF-8 bytes (level 6,
  * raw stream, no dictionary). Empty string → 1.0 by definition. The
  * value is deterministic for a given input and zlib build — a
  * DOCUMENT-SCOPED signal for thresholding, not a cross-engine
  * replayable quantity (no SQL oracle; the driver records the weaker
  * rows-only check, and the spec pins the orderings that make the
  * signal useful: repetition < prose < noise).
  *
  * Native Catalyst expression (codegen'd call into the static kernel,
  * same tier as [[JaroWinklerExpr]]) — no UDF serialization overhead in
  * the hot path.
  */
object CompressRatioExpr {

  def compress_ratio(c: Column): Column =
    GraftShim.columnOf(CompressRatio(GraftShim.expressionOf(c)))

  /** Static kernel shared by interpreted eval and generated code. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n.toDouble / raw.length.toDouble
    } finally d.end()
  }
}

case class CompressRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compress_ratio"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"compress_ratio expects a STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    CompressRatioExpr.ratio(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressRatioExpr.ratio($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CompressRatio = copy(child = newChild)
}
