package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native integer dot product over two int-array columns (long
  * accumulator, exact) as a codegen'd Catalyst expression — the scoring
  * kernel for int8-quantized similarity search (similarity.Quantize):
  * quantized components are at most 127 in magnitude, so a long
  * accumulator is exact for any realistic dimensionality, and the result
  * rescales to the original space by amaxA * amaxB / 127^2.
  *
  * Same rationale as [[FloatDotExpr]]: the higher-order-function form
  * (`aggregate(zip_with(...))`) evaluates interpreted with a lambda
  * dispatch per element; this compiles to a tight primitive loop.
  */
object IntDotExpr {
  def int_dot(a: Column, b: Column): Column =
    GraftShim.columnOf(IntDot(GraftShim.expressionOf(a), GraftShim.expressionOf(b)))

  /** Static helper shared by interpreted eval and generated code.
    * Returns null (boxed) on a length mismatch or a null element —
    * matching the null-poisoning `aggregate(zip_with(...))` fold this
    * expression replaces, instead of silently truncating or reading
    * null slots as 0. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

case class IntDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_dot expects ARRAY<INT> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntDotExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""java.lang.Long $r = graft.functions.IntDotExpr.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}
