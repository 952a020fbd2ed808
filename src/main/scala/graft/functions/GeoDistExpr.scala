package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Equirectangular (flat-earth) distance in km as ONE native expression —
  * the same trig-free formula as DistanceEnrichment.FlatEarthService
  * (pure -, *, + and a correctly-rounded sqrt: bit-reproducible on any
  * IEEE engine, unlike haversine whose libm sin/cos differ across
  * engines).
  *
  * Being a single Catalyst node (rather than a composed Column tree) is
  * what lets `plans.GeoFilterRule` RECOGNIZE radius predicates
  * structurally and conjoin a sargable bounding box — see that rule for
  * the scan-pruning payoff.
  */
object GeoDistExpr {
  /** Km per degree of latitude (and of longitude at the equator) —
    * matches FlatEarthService. */
  val KmPerDegree = 111.32

  def geo_dist(latA: Column, lonA: Column, latB: Column, lonB: Column): Column =
    GraftShim.columnOf(GeoDist(
      GraftShim.expressionOf(latA), GraftShim.expressionOf(lonA),
      GraftShim.expressionOf(latB), GraftShim.expressionOf(lonB)))

  /** Shared by interpreted eval and generated code. */
  def km(latA: Double, lonA: Double, latB: Double, lonB: Double): Double = {
    val dLat = latA - latB
    val dLon = lonA - lonB
    math.sqrt(dLat * dLat + dLon * dLon) * KmPerDegree
  }
}

case class GeoDist(first: Expression, second: Expression,
                   third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoDistExpr.km(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.GeoDistExpr.km($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): GeoDist =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
