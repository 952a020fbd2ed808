package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** Exact decimal dot product over two float-array columns as a native
  * codegen'd expression.
  *
  * Semantics are IDENTICAL to the expression-composed form
  *   aggregate(zip_with(a, b, (x,y) -> CAST(double(x)*double(y) AS
  *   DECIMAL(20,12))), 0, (acc,v) -> acc+v)
  * — each element product is rounded through `BigDecimal.valueOf`
  * (Double.toString shortest representation, HALF_UP at scale 12),
  * exactly Spark's double->decimal cast path — but accumulated as an
  * unscaled long (exact: |sum| <= 64 * 2.5e11 << 2^63), with none of the
  * interpreted per-element lambda dispatch that made the HOF form the
  * bench bottleneck (~6x slower at sf0.1 before JIT warms).
  */
object DecimalDotExpr {
  val ResultType: DecimalType = DecimalType(30, 12)

  def decimal_dot(a: Column, b: Column): Column =
    GraftShim.columnOf(DecimalDot(GraftShim.expressionOf(a), GraftShim.expressionOf(b)))

  /** Round p to 12 fractional digits with BigDecimal.valueOf semantics
    * (Spark's double->decimal cast). Fast path: scale by 1e12 in double
    * and round — valid when the scaled value is farther from a half-way
    * boundary than the worst-case double multiply error (~2.8e-5 scaled
    * units for |p| <= 250); near boundaries, fall back to the exact
    * string-representation path. */
  private def roundScaled(p: Double): Long = {
    val v = p * 1e12
    val nearest = Math.rint(v)
    if (Math.abs(v) < 4.0e15 && Math.abs(Math.abs(v - nearest) - 0.5) > 1e-4) {
      // Not near a .5 boundary: nearest long is unambiguous.
      nearest.toLong
    } else {
      JBigDecimal.valueOf(p)
        .setScale(12, RoundingMode.HALF_UP).unscaledValue().longValueExact()
    }
  }

  /** Static helper shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData): Decimal = {
    val n = math.min(a.numElements(), b.numElements())
    var unscaled = 0L
    var i = 0
    while (i < n) {
      unscaled += roundScaled(a.getFloat(i).toDouble * b.getFloat(i).toDouble)
      i += 1
    }
    val dec = Decimal(BigDecimal(BigInt(unscaled), 12))
    dec.changePrecision(30, 12)
    dec
  }
}

case class DecimalDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DecimalDotExpr.ResultType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"decimal_dot expects ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalDotExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DecimalDotExpr.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDot =
    copy(left = newLeft, right = newRight)
}
