package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** Per-node triangle counting + local clustering coefficient — the graph
  * statistic behind community detection, link-spam screens, and graph
  * quality reports over co-occurrence graphs (parts co-ordered, users
  * co-visiting, docs sharing fingerprints).
  *
  * Algorithm (Suri & Vassilvitskii's MR triangle counting): canonicalize
  * to undirected distinct edges, then ORIENT each edge from its
  * lower-(degree, id) endpoint to the higher one. Every triangle has
  * exactly one node with two outgoing oriented edges (its minimum-degree
  * corner), so enumerating wedges only at oriented sources and closing
  * them against the canonical edge set counts each triangle exactly once
  * — and the wedge count is sum over nodes of C(outdeg', 2) with outdeg'
  * bounded by O(sqrt(m)) on any graph, the property that keeps the
  * shuffle polynomial-bounded when a celebrity node would make naive
  * id-ordered wedging quadratic. Total work O(m^1.5); three shuffles
  * (degree agg, wedge self-join, closing equi-join), no cross product.
  *
  * Counts are orientation-invariant, so an oracle may verify with any
  * other orientation (e.g. plain id order).
  */
object Triangles {

  /** @param edges undirected edge list (self-loops and duplicates fine —
    *               canonicalized away); endpoints any orderable type.
    * Output: node, degree (distinct undirected neighbors), n_tri
    * (triangles through the node), clustering (2*n_tri / (deg*(deg-1)),
    * 0.0 for degree < 2). */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String,
      scope: CacheScope = CacheScope.session): DataFrame = {
    // retained: the canonical edge set is consumed FOUR times (degree
    // derivation scans it twice via the endpoint union, orientation
    // once, wedge close once) and its upstream derivation is often the
    // expensive part (e.g. a co-occurrence self-join) — without
    // retention that subtree re-executes per consumer whenever AQE
    // breaks exchange reuse, which measured as a super-linear wall-clock
    // exponent at 10× volume (ScaleCheck round 9)
    val und = scope.retain(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())

    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

    // Orient a->b when (deg(a), a) < (deg(b), b). Degrees join back onto
    // the edge list (two hash joins; the degree table is |V|-sized and
    // usually broadcastable — left to AQE).
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

    // Wedges at each oriented source; id order on (d1, d2) dedups the
    // unordered neighbor pair.
    val w1 = oriented.select(col("src"), col("dst").as("d1"))
    val w2 = oriented.select(col("src"), col("dst").as("d2"))
    val wedges = w1.join(w2, "src").filter(col("d1") < col("d2"))

    // Close each wedge against the canonical edge set (d1 < d2 already
    // holds, so the wedge pair is in canonical order). shuffle_hash: the
    // edge side is m rows while the wedge side is O(m^1.5) — a sort-merge
    // join would SORT the wedge fan-out (the n·log n over the biggest
    // table in the plan; measured 16× wall at 10× volume before the
    // hint), a shuffled hash join builds on the small side and streams
    // the wedges untouched.
    val tri = wedges.join(und.hint("shuffle_hash"),
      col("d1") === col("a") && col("d2") === col("b"))
      .select(col("src").as("x"), col("d1").as("y"), col("d2").as("z"))

    val triPerNode = tri.select(explode(array(col("x"), col("y"), col("z")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))

    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("degree") < 2, lit(0.0)).otherwise(
          lit(2.0) * col("n_tri").cast("double") /
            (col("degree").cast("double") *
              (col("degree").cast("double") - lit(1.0)))))
  }
}
