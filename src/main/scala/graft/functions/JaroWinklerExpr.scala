package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd Catalyst expression —
  * the record-linkage scoring staple Spark's function library lacks
  * (it ships only `levenshtein`/`soundex`). Complements
  * [[graft.operators.FuzzyJoin]]: the edit-distance ball generates
  * candidates, Jaro-Winkler ranks them (transposition-tolerant, early
  * characters weighted — the right metric for names and codes).
  *
  * Semantics are pinned to the standard published definition with the
  * parameters DuckDB's `jaro_winkler_similarity` uses (prefix weight
  * 0.1 over at most 4 characters, boost threshold 0.7, BOTH-empty and
  * one-empty both 0.0), verified bit-exact against it on 7000+ random
  * strings during development — so the DuckDB oracle compares raw
  * doubles, no rounding waypoint needed. Operates on UTF-8 BYTES (as
  * DuckDB does): multi-byte codepoints count per byte; for ASCII data
  * the two views coincide.
  *
  * The double arithmetic order is part of the contract:
  * `(m/l1 + m/l2 + (m-t)/m) / 3`, then `j + p*0.1*(1-j)` — each a
  * correctly-rounded IEEE op, so any engine evaluating the same shape
  * reproduces the bits.
  */
object JaroWinklerExpr {

  def jaro_winkler(a: Column, b: Column): Column =
    GraftShim.columnOf(
      JaroWinkler(GraftShim.expressionOf(a), GraftShim.expressionOf(b)))

  /** Static kernel shared by interpreted eval and generated code. */
  def jw(aStr: UTF8String, bStr: UTF8String): Double = {
    val s1 = aStr.getBytes
    val s2 = bStr.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = {
      val w = (if (l1 > l2) l1 else l2) / 2 - 1
      if (w < 0) 0 else w
    }
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i > window) i - window else 0
      val hi = if (i + window + 1 < l2) i + window + 1 else l2
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3
    if (j > 0.7) {
      var p = 0
      val maxP = Seq(4, l1, l2).min
      while (p < maxP && s1(p) == s2(p)) p += 1
      j + p * 0.1 * (1 - j)
    } else j
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.StringType
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects STRING inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerExpr.jw($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
