package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Patch application + drop-lines — `merge_patches`
  * (patchwork.py:1113-1257).
  *
  * A patch file carries only QA-touched rows (PK-indexed) and only the
  * processed columns; applying it overwrites those cells on the base table
  * — including overwriting with null (pandas `df.loc[idx, cols] = fixes`
  * assigns NaN too, patchwork.py:1145-1179), so this is NOT a coalesce:
  * membership in the patch decides which side wins.
  *
  * At scale the patch is small relative to the base — the equi join
  * broadcasts; the base never shuffles.
  */
object PatchMerge {

  /** Overwrite base cells from `patch` (pk columns + patched columns). */
  def applyPatch(base: DataFrame, patch: DataFrame, pks: Seq[String]): DataFrame = {
    val patchCols = patch.columns.filterNot(pks.contains(_))
    val p = broadcast(
      patch.withColumn("__patched", lit(true))
        .select((pks :+ "__patched").map(col) ++
          patchCols.map(c => col(c).as(s"__patch_$c")): _*))
    val joined = base.join(p, pks, "left")
    val replaced = base.columns.map { c =>
      if (patchCols.contains(c))
        when(col("__patched").isNotNull, col(s"__patch_$c"))
          .otherwise(col(c)).as(c)
      else col(c)
    }
    joined.select(replaced.toIndexedSeq: _*)
  }

  /** Remove rows whose PK tuple appears in any QA DROP_LINE set
    * (patchwork.py:1181-1212): dedup the key set, then left-anti join. */
  def applyDropLines(base: DataFrame, dropKeys: DataFrame, pks: Seq[String]): DataFrame =
    base.join(dropKeys.select(pks.map(col): _*).distinct(), pks, "left_anti")

  /** Consolidation step (patchwork.py:1218-1250): apply patches, apply
    * drop lines, synthesize the WKT point column from lat/lon, stamp the
    * provenance column. `adjust` mirrors the reference's
    * `adjust_dataframe` callback hook. */
  def consolidate(
      base: DataFrame,
      patches: Seq[DataFrame],
      dropKeys: Option[DataFrame],
      pks: Seq[String],
      latLon: Option[(String, String, String)] = None, // (lat, lon, outCol)
      baseOrigem: Option[String] = None,
      adjust: DataFrame => DataFrame = identity): DataFrame = {
    val patched = patches.foldLeft(base)((b, p) => applyPatch(b, p, pks))
    val dropped = dropKeys.fold(patched)(dk => applyDropLines(patched, dk, pks))
    val withWkt = latLon.fold(dropped) { case (lat, lon, out) =>
      dropped.withColumn(out,
        GeoFunctions.wktPoint(col(lon).cast("double"), col(lat).cast("double")))
    }
    val stamped = baseOrigem.fold(withWkt)(o =>
      withWkt.withColumn("base_origem", lit(o)))
    adjust(stamped)
  }
}
