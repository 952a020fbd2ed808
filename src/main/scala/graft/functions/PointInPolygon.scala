package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Point-in-polygon by the even–odd crossing rule (the classic ray
  * cast: shoot +x, count edge crossings, odd ⇒ inside) as a PURE
  * Column composition — per edge one comparison pair and one
  * multiply/divide/add chain, folded into a crossing COUNT whose
  * parity decides containment. No UDF, fully codegen'd, and every op
  * is correctly-rounded IEEE arithmetic, so results are
  * engine-reproducible; [[sql]] emits the char-identical arithmetic
  * (with literals printed from the SAME Scala doubles) for a DuckDB
  * oracle.
  *
  * The polygon is a COMPILE-TIME constant ring (the curation use:
  * "keep points inside this region" — a fixed geofence baked into the
  * plan, the GeoFilterRule bounding-box precedent). Data-sized polygon
  * sets would need a spatial join, out of scope here. Vertices are
  * (x, y); the ring closes itself (last→first edge implied). Points ON
  * an edge follow the crossing rule's half-open convention (shared
  * edges of adjacent polygons count a point exactly once) —
  * deterministic, same both engines.
  *
  * Scale: a per-row projection with |V| fused terms — zero shuffles,
  * prunable to the two coordinate columns; for a convex-ish fence,
  * conjoin a bounding-box pre-filter so the scan can push it down. */
object PointInPolygon {

  /** Crossing-parity containment test. `poly` is the vertex ring. */
  def contains(x: Column, y: Column, poly: Seq[(Double, Double)]): Column = {
    require(poly.length >= 3, s"polygon needs >= 3 vertices: ${poly.length}")
    val crossings = edges(poly).map { case ((xi, yi), (xj, yj)) =>
      val straddles = (lit(yi) > y) =!= (lit(yj) > y)
      val xCross = (lit(xj) - lit(xi)) * (y - lit(yi)) /
        (lit(yj) - lit(yi)) + lit(xi)
      when(straddles && x < xCross, 1).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  /** The identical test as DuckDB SQL text over column expressions
    * `x` / `y` (literals interpolated from the same doubles — a
    * hand-typed 0.15 is not 1.0 - 0.85). */
  def sql(x: String, y: String, poly: Seq[(Double, Double)]): String = {
    require(poly.length >= 3, s"polygon needs >= 3 vertices: ${poly.length}")
    val terms = edges(poly).map { case ((xi, yi), (xj, yj)) =>
      s"""CASE WHEN (($yi > $y) <> ($yj > $y)) AND
         |($x < ($xj - $xi) * ($y - $yi) / ($yj - $yi) + $xi)
         |THEN 1 ELSE 0 END""".stripMargin.replace('\n', ' ')
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  private def edges(poly: Seq[(Double, Double)]) =
    poly.zip(poly.tail :+ poly.head)
}
