package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic truncate-then-load for file destinations (SURVEY §7.5.6): the
  * reference does TRUNCATE + INSERT + single COMMIT in one destination
  * transaction; Spark's file committer alone leaves a window where the
  * destination is empty or partial. This utility writes to a staging
  * directory and swaps via filesystem rename — readers see either the old
  * or the new complete dataset, never an intermediate state.
  *
  * (On a production deployment a transactional table format provides this;
  * the swap protocol here covers plain-parquet destinations and is also
  * what `StreamingSync.mergeStream` commits through.)
  */
object AtomicParquet {

  /** Write `df` as the new content of `destDir`, atomically. */
  def overwrite(df: DataFrame, destDir: String): Unit = {
    val dest = Paths.get(destDir)
    val staging = Paths.get(destDir + ".__staging__")
    val backup = Paths.get(destDir + ".__old__")
    deleteRecursively(staging)
    df.write.mode("overwrite").parquet(staging.toString)
    // swap: dest -> backup, staging -> dest, drop backup
    deleteRecursively(backup)
    if (Files.exists(dest))
      Files.move(dest, backup, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(staging, dest, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        // roll back: restore the previous generation
        if (Files.exists(backup) && !Files.exists(dest))
          Files.move(backup, dest, StandardCopyOption.ATOMIC_MOVE)
        throw e
    }
    deleteRecursively(backup)
  }

  def read(spark: SparkSession, destDir: String): DataFrame =
    spark.read.parquet(destDir)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}
