package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as a native Catalyst
  * expression with whole-stage codegen (SURVEY §7.4's "custom Expression"
  * tier: faster than a Scala UDF — no row boxing, no closure dispatch;
  * the generated code calls one static method over the UTF8 bytes).
  *
  * h = fold(bytes) { h * 257 + b } mod 1e9+7 — deterministic across
  * platforms, streams over the bytes without materializing a copy.
  */
object RollingHashExpr {
  final val Base = 257L
  final val Mod = 1000000007L

  /** Static helper referenced by both interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xFF)) % Mod
      i += 1
    }
    h
  }

  /** Column-level entry point. */
  def rolling_hash(c: Column): Column =
    GraftShim.columnOf(RollingHash(GraftShim.expressionOf(c)))
}

case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHashExpr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
