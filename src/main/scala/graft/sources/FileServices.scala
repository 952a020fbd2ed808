package graft.sources

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path => HPath}

import org.apache.spark.sql.SparkSession

/** File-share services (samba_services.py:163-259) re-expressed on the
  * Hadoop FileSystem API: the reference talks SMB wire protocol from the
  * worker; on a Spark deployment a share is a mounted path (or any
  * FS-scheme'd location — file://, hdfs://), so the engine-side surface
  * is scheme-agnostic path ops. Parsing of the fetched files is
  * `IO.CsvSource` / `sources.ExcelSource` (get_samba_df's two branches).
  *
  * All ops are driver-side and bounded by file counts, never data size —
  * no Spark job is launched.
  */
object FileServices {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Create a folder unless it already exists — create_folder
    * (samba_services.py:163-189): existing folders are not an error. */
  def createFolder(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new HPath(path)
    if (!f.exists(p) && !f.mkdirs(p))
      sys.error(s"Folder $path creation failed.")
  }

  /** Move files pairwise — move_files (samba_services.py:191-259): each
    * (source, dest) is copied, then the source is deleted when
    * `deleteSource` (the reference's copy+delete; a same-FS rename IS
    * that sequence done natively, so it is used when possible). Errors
    * name the failing side like the reference's exception cascade. */
  def moveFiles(spark: SparkSession, pairs: Seq[(String, String)],
      deleteSource: Boolean = true): Unit =
    pairs.foreach { case (src, dst) =>
      val sf = fs(spark, src)
      val df = fs(spark, dst)
      val sp = new HPath(src)
      val dp = new HPath(dst)
      if (!sf.exists(sp)) sys.error(s"""Error reading file "$src"""")
      val sameFs = sf.getUri == df.getUri
      if (sameFs && deleteSource) {
        if (!sf.rename(sp, dp)) sys.error(s"""Error writing file on "$dst"""")
      } else {
        val conf = spark.sessionState.newHadoopConf()
        if (!FileUtil.copy(sf, sp, df, dp, false, true, conf))
          sys.error(s"""Error writing file on "$dst"""")
        if (deleteSource && !sf.delete(sp, false))
          sys.error(s"""Error deleting source file on "$src"""")
      }
    }

  /** Last modification time — get_file_last_write_time
    * (samba_services.py:84-106), the freshness probe behind the
    * reference's trigger sensors (S12/S13). */
  def lastWriteTime(spark: SparkSession, path: String): Timestamp =
    new Timestamp(fs(spark, path).getFileStatus(new HPath(path))
      .getModificationTime)

  /** Names of entries directly under `path` (listPath's directory view),
    * used by the newest-file selection in FileDrop. */
  def list(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    f.listStatus(new HPath(path)).toSeq.map(_.getPath.getName)
  }
}
