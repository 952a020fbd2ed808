package graft.core

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet directories — the maintenance pass
  * every incremental pipeline needs: appends and per-batch state
  * partitions accumulate files far below the ideal scan granularity, and
  * at 100 TB the NameNode/listing cost and per-file open overhead of a
  * million 2 MB files dominate the read path long before the bytes do.
  *
  * `compact` sizes the rewrite from the actual FS listing
  * (`ceil(bytes / targetBytes)` output files, min 1), round-robin
  * repartitions — even output sizes without assuming any key
  * distribution — and swaps atomically via [[AtomicParquet]] (readers
  * see the old or the new complete directory, never a mix). Idempotent:
  * re-running on a compacted directory is a no-op-sized rewrite.
  *
  * Returns (filesBefore, bytesBefore, filesAfter).
  */
object Compaction {

  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Long, Int) = {
    require(targetBytes > 0, s"bad targetBytes=$targetBytes")
    val fs = new HPath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(new HPath(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = AtomicParquet.read(spark, dir).repartition(nOut)
    AtomicParquet.overwrite(df, dir)
    (before.length, bytes, dataFiles().length)
  }

  /** Compaction + z-order reclustering in ONE atomic rewrite: size the
    * output from the listing like [[compact]], but range-partition and
    * sort on the Morton key of two columns ([[ZOrder]]) instead of
    * round-robin — the same maintenance pass then also restores
    * multi-column min-max selectivity that drifts as appends interleave
    * key ranges. The swap is the same [[AtomicParquet]] staged rename,
    * so readers never see a partial recluster.
    *
    * Returns (filesBefore, bytesBefore, filesAfter). */
  def recluster(spark: SparkSession, dir: String,
      colA: String, boundsA: (Double, Double),
      colB: String, boundsB: (Double, Double),
      targetBytes: Long = 128L * 1024 * 1024): (Int, Long, Int) = {
    require(targetBytes > 0, s"bad targetBytes=$targetBytes")
    val fs = new HPath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(new HPath(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = ZOrder.layout(AtomicParquet.read(spark, dir),
      colA, boundsA, colB, boundsB, partitions = nOut)
    AtomicParquet.overwrite(df, dir)
    (before.length, bytes, dataFiles().length)
  }
}
