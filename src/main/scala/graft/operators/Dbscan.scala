package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.dedup.ConnectedComponents

/** Density-based clustering (DBSCAN, Ester et al. 1996) by grid
  * bucketing — the "find the blobs and the outliers" companion to the
  * centroid family ([[graft.similarity.CosineSearch]] k-means buckets):
  * no k to choose, arbitrary cluster shapes, and an explicit NOISE
  * verdict for points in no dense region (the anomaly-screen read of a
  * 2-D feature scatter).
  *
  * INTEGER-NATIVE contract: coordinates arrive as exact micro-unit
  * longs (callers quantize upstream), `eps` as a micro-unit radius, and
  * every distance test is an integer compare of squared micro
  * distances — no floats anywhere, so results are bit-identical across
  * engines, partitionings, and reruns by construction.
  *
  * Determinism note: classic DBSCAN assigns a border point (non-core
  * within eps of several cores) to whichever cluster scans it first —
  * order-dependent. Here a border point joins the MINIMUM cluster id
  * among its core neighbors: a total rule, so the labeling is unique.
  *
  * Shape at 100 TB: the grid cell edge equals eps, so all within-eps
  * neighbors lie in the 3×3 cell neighborhood — candidate pairs come
  * from ONE equi-join on cell id with a ×9 explode on one side (the
  * [[GeoJoin]] screen; never |P|²), neighbor counts partial-aggregate
  * map-side, and the transitive closure over core-core edges is the
  * O(log n) large-star/small-star contraction
  * ([[ConnectedComponents]]), not a propagation chain. Worst-case
  * degradation is the per-cell density bound, not a cross join.
  */
object Dbscan {

  /** Cluster the integer micro-unit points (idCol, xMicroCol,
    * yMicroCol): returns (id, n_neighbors, is_core, cluster_id) for
    * EVERY input point — n_neighbors counts the point itself (the
    * |N_eps(p)| convention), cluster_id is the min point id of the
    * cluster's core set, null for noise. Non-negative coordinates
    * required (the grid floor-div is plain integer division); rows
    * with null id or coordinates are dropped. */
  def cluster(df: DataFrame, idCol: String, xMicroCol: String,
      yMicroCol: String, epsMicro: Long, minPts: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(epsMicro > 0, s"epsMicro must be positive, got $epsMicro")
    // overflow guard for the integer-native contract: d2 is computed in
    // LONG on pairs that survive the 3×3 cell screen, where each axis
    // separation is < 2·eps, so d2 < 8·eps² — eps ≤ 2^30−1 keeps that
    // under 2^63 (and the driver-side eps² well inside Long). Beyond
    // this bound the squared terms would wrap SILENTLY (non-ANSI);
    // callers with coarser units must rescale their micro quantum.
    require(epsMicro <= 1073741823L,
      s"epsMicro must be <= 2^30-1 (long-exact d2 bound), got $epsMicro")
    require(minPts >= 1, s"minPts >= 1 required, got $minPts")
    val pts = scope.retain(df
      .filter(col(idCol).isNotNull &&
        col(xMicroCol).isNotNull && col(yMicroCol).isNotNull)
      .select(col(idCol).as("pid"),
        col(xMicroCol).cast("long").as("xm"),
        col(yMicroCol).cast("long").as("ym"))
      // exact integer floor-div (coords are non-negative): subtract the
      // remainder first — Spark's `/` on longs is DOUBLE division, and
      // a quotient rounding up across an integer boundary would shift
      // the cell; the exact-multiple quotient cannot round
      .withColumn("cx",
        ((col("xm") - col("xm") % epsMicro) / epsMicro).cast("long"))
      .withColumn("cy",
        ((col("ym") - col("ym") % epsMicro) / epsMicro).cast("long")))
    // candidate screen: right side exploded to its 3x3 neighborhood,
    // one equi-join on the cell id (the GeoJoin idiom, self-joined)
    val offsets = array((-1 to 1).map(lit): _*)
    val right = pts
      .withColumn("dx", explode(offsets))
      .withColumn("dy", explode(offsets))
      .select(col("pid").as("qid"),
        col("xm").as("qxm"), col("ym").as("qym"),
        (col("cx") + col("dx")).as("cx"),
        (col("cy") + col("dy")).as("cy"))
    val d2 = (col("xm") - col("qxm")) * (col("xm") - col("qxm")) +
      (col("ym") - col("qym")) * (col("ym") - col("qym"))
    // pairs include pid = qid (self at distance 0): |N_eps| counts the
    // point itself, and self-pairs register isolated cores as CC nodes
    val pairs = scope.retain(pts.join(right, Seq("cx", "cy"))
      .filter(d2 <= epsMicro * epsMicro)
      .select(col("pid"), col("qid")))
    val flags = scope.retain(pairs.groupBy(col("pid"))
      .agg(count(lit(1)).as("n_neighbors"))
      .withColumn("is_core", col("n_neighbors") >= minPts))
    val coreIds = flags.filter(col("is_core")).select(col("pid"))
    val coreEdges = pairs
      .join(coreIds, Seq("pid"))
      .join(coreIds.select(col("pid").as("qid")), Seq("qid"))
    val coreLabels = ConnectedComponents
      .labels(coreEdges, "pid", "qid")
      .select(col("id").as("pid"), col("cluster_id"))
    // border rule: min core-neighbor cluster (total order, see scaladoc)
    val borderLabels = pairs
      .join(flags.select(col("pid"), col("is_core")), Seq("pid"))
      .filter(!col("is_core"))
      .join(coreLabels.select(col("pid").as("qid"),
        col("cluster_id").as("qcl")), Seq("qid"))
      .groupBy(col("pid")).agg(min(col("qcl")).as("border_cluster"))
    flags
      .join(coreLabels, Seq("pid"), "left")
      .join(borderLabels, Seq("pid"), "left")
      .select(col("pid"), col("n_neighbors"), col("is_core"),
        coalesce(col("cluster_id"), col("border_cluster"))
          .as("cluster_id"))
  }
}
