package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{GeoDist, GeoDistExpr}

/** Optimizer rule: point-radius geo filters get a derived, SARGABLE
  * bounding box.
  *
  *   geo_dist(litLat, litLon, lat, lon) <= r
  *     ==>  ... AND lat >= litLat-Δ AND lat <= litLat+Δ
  *              AND lon >= litLon-Δ AND lon <= litLon+Δ
  *
  * The distance predicate itself can never reach a parquet scan (it is
  * a computed expression), so a bare radius query reads every row group
  * of a 100 TB table. The conjoined bounds are plain attribute-vs-
  * literal comparisons — exactly what the file source pushes down, so
  * row groups whose lat/lon min-max envelopes fall outside the box are
  * skipped without decoding (and with a Z-ordered layout, `core.ZOrder`,
  * most of them are).
  *
  * Soundness: Δ = r/KmPerDegree widened by one ulp, and the bounds are
  * widened one further ulp outward — the box strictly CONTAINS the
  * disc, so adding it never changes the result set (the exact predicate
  * still runs). Matching is strict: a Literal center and radius, plain
  * attribute coordinates — anything else is left untouched.
  *
  * Idempotent by construction: bounds already present among the
  * filter's conjuncts (semantically) are not added again, so the
  * optimizer's fixed-point batches converge after one application.
  *
  * Install via `spark.experimental.extraOptimizations` on a live
  * session (`GraftExtensions.registerRules`) or
  * `spark.sql.extensions=graft.GraftExtensions` at build time.
  */
object GeoFilterRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val present = splitConjuncts(cond)
      val extra = present.flatMap(bounds).filterNot(b =>
        present.exists(_.semanticEquals(b)))
      if (extra.isEmpty) f
      else Filter(extra.foldLeft(cond)(And(_, _)), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** The bounding box for one radius conjunct, or empty. */
  private def bounds(e: Expression): Seq[Expression] = e match {
    case LessThanOrEqual(g: GeoDist, Literal(r: Double, DoubleType)) => box(g, r)
    case LessThan(g: GeoDist, Literal(r: Double, DoubleType)) => box(g, r)
    case GreaterThanOrEqual(Literal(r: Double, DoubleType), g: GeoDist) => box(g, r)
    case GreaterThan(Literal(r: Double, DoubleType), g: GeoDist) => box(g, r)
    case _ => Nil
  }

  private def box(g: GeoDist, r: Double): Seq[Expression] = g match {
    case GeoDist(Literal(cLat: Double, DoubleType),
                 Literal(cLon: Double, DoubleType),
                 lat: Attribute, lon: Attribute) if r >= 0 =>
      val delta = Math.nextUp(r / GeoDistExpr.KmPerDegree)
      def lo(c: Double) = Literal(Math.nextDown(c - delta), DoubleType)
      def hi(c: Double) = Literal(Math.nextUp(c + delta), DoubleType)
      Seq(
        GreaterThanOrEqual(lat, lo(cLat)), LessThanOrEqual(lat, hi(cLat)),
        GreaterThanOrEqual(lon, lo(cLon)), LessThanOrEqual(lon, hi(cLon)))
    case _ => Nil
  }
}
