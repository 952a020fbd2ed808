package graft.core

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet tables with time travel — the minimal snapshot
  * protocol a 100 TB pipeline needs for "reprocess against yesterday's
  * input" and "oops, roll back the bad load", without adopting a full
  * transactional table format.
  *
  * Layout:
  * {{{
  *   table/
  *     v=1/ v=2/ ...        immutable per-version parquet directories
  *     _commits/1 _commits/2 ...   zero-byte commit markers
  * }}}
  *
  * Protocol: a commit writes its data directory COMPLETELY, then
  * creates `_commits/N` with create-exclusive semantics. The marker is
  * the single source of truth:
  *   - a crash mid-write leaves an unmarked `v=N` directory that no
  *     reader ever resolves ([[vacuum]] reclaims it);
  *   - marker creation is atomic and exclusive, so two racing writers
  *     cannot both claim version N — the loser retries at N+1;
  *   - readers resolve a version FIRST, then read an immutable
  *     directory, so a concurrent commit never changes data under a
  *     running query (snapshot isolation for the read).
  * [[rollback]] truncates history by deleting markers above the target
  * (data directories stay until [[prune]]d, so a rollback is itself
  * reversible until then). Like AtomicParquet, the guarantees need
  * atomic create/rename — local FS and HDFS, not copy-based object
  * stores.
  */
object Snapshots {

  private val MaxCommitRetries = 20

  /** Commit `df` as the next version; returns the version number. */
  def commit(df: DataFrame, tableDir: String): Long =
    commitWith(df, tableDir, (_, _) => ())

  private def commitWith(df: DataFrame, tableDir: String,
      beforeMark: (FileSystem, HPath) => Unit): Long = {
    val spark = df.sparkSession
    val fs = fileSystem(spark, tableDir)
    fs.mkdirs(new HPath(tableDir, "_commits"))
    var attempt = 0
    var v = latestVersion(fs, tableDir).getOrElse(0L) + 1
    while (attempt < MaxCommitRetries) {
      val data = new HPath(tableDir, s"v=$v")
      fs.delete(data, true) // debris from an unmarked, crashed attempt
      df.write.mode("error").parquet(data.toString)
      beforeMark(fs, data) // extra dir contents (tags) precede the claim
      try {
        // create-exclusive: the atomic claim of version v
        fs.create(new HPath(tableDir, s"_commits/$v"), false).close()
        return v
      } catch {
        case _: java.io.IOException =>
          // another writer claimed v between our read and our marker —
          // discard our data dir and retry one version up
          fs.delete(data, true)
          attempt += 1
          v = latestVersion(fs, tableDir).getOrElse(v) + 1
      }
    }
    sys.error(s"Snapshots.commit: lost the version race $MaxCommitRetries times at $tableDir")
  }

  /** Commit with an idempotency tag: when a COMMITTED version already
    * carries `tag`, the commit is skipped and None is returned. The tag
    * is a zero-byte `_tag-<tag>` file written INTO the data directory
    * before the marker claim, so the check and the commit share the
    * marker's atomicity: a crash before the marker leaves an unmarked
    * (invisible) dir and the retry commits cleanly; a crash after the
    * marker leaves the tag visible and the retry skips. This is the
    * exactly-once hook [[graft.streaming.SnapshotSink]] uses for
    * replayed micro-batch ids. (Underscore-prefixed files are ignored
    * by parquet readers.) Concurrent same-tag writers are not
    * serialized — the contract targets sequential retries/replays. */
  def commitTagged(df: DataFrame, tableDir: String, tag: String): Option[Long] = {
    val spark = df.sparkSession
    val fs = fileSystem(spark, tableDir)
    if (taggedVersion(fs, tableDir, tag).isDefined) return None
    Some(commitWith(df, tableDir, (f, data) =>
      f.create(new HPath(data, s"_tag-$tag"), true).close()))
  }

  /** The committed version carrying `tag`, if any. */
  def taggedVersion(spark: SparkSession, tableDir: String,
      tag: String): Option[Long] =
    taggedVersion(fileSystem(spark, tableDir), tableDir, tag)

  private def taggedVersion(fs: FileSystem, tableDir: String,
      tag: String): Option[Long] =
    committedVersions(fs, tableDir).sorted.find(v =>
      fs.exists(new HPath(tableDir, s"v=$v/_tag-$tag")))

  /** Read a specific committed version, or the latest when None. */
  def read(spark: SparkSession, tableDir: String,
      version: Option[Long] = None): DataFrame = {
    val fs = fileSystem(spark, tableDir)
    val vs = committedVersions(fs, tableDir)
    require(vs.nonEmpty, s"no committed versions at $tableDir")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v),
      s"version $v not committed at $tableDir (have ${vs.sorted.mkString(",")})")
    spark.read.parquet(new HPath(tableDir, s"v=$v").toString)
  }

  /** Committed versions, ascending. */
  def versions(spark: SparkSession, tableDir: String): Seq[Long] =
    committedVersions(fileSystem(spark, tableDir), tableDir).sorted

  /** Drop every commit AFTER `toVersion` — the next read resolves
    * `toVersion` as latest. Data directories are kept (a rollback can
    * itself be undone by re-creating markers) until [[prune]]. */
  def rollback(spark: SparkSession, tableDir: String, toVersion: Long): Unit = {
    val fs = fileSystem(spark, tableDir)
    val vs = committedVersions(fs, tableDir)
    require(vs.contains(toVersion),
      s"cannot roll back to uncommitted version $toVersion")
    vs.filter(_ > toVersion).foreach { v =>
      fs.delete(new HPath(tableDir, s"_commits/$v"), false)
    }
  }

  /** Keep the newest `keep` committed versions; delete older markers
    * AND their data. The latest version is always kept. */
  def prune(spark: SparkSession, tableDir: String, keep: Int): Unit = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val fs = fileSystem(spark, tableDir)
    val vs = committedVersions(fs, tableDir).sorted
    vs.dropRight(keep).foreach { v =>
      fs.delete(new HPath(tableDir, s"_commits/$v"), false)
      fs.delete(new HPath(tableDir, s"v=$v"), true)
    }
  }

  /** Delete data directories that have no commit marker: crashed
    * commits and pruned-marker leftovers. Never touches committed
    * versions. */
  def vacuum(spark: SparkSession, tableDir: String): Seq[Long] = {
    val fs = fileSystem(spark, tableDir)
    val committed = committedVersions(fs, tableDir).toSet
    val dataDirs = Option(fs.globStatus(new HPath(tableDir, "v=*")))
      .getOrElse(Array.empty).toSeq
      .flatMap(s => versionOf(s.getPath.getName))
    val orphans = dataDirs.filterNot(committed)
    orphans.foreach(v => fs.delete(new HPath(tableDir, s"v=$v"), true))
    orphans.sorted
  }

  private def versionOf(dirName: String): Option[Long] =
    if (dirName.startsWith("v=")) dirName.drop(2).toLongOption else None

  private def committedVersions(fs: FileSystem, tableDir: String): Seq[Long] = {
    val dir = new HPath(tableDir, "_commits")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(_.getPath.getName.toLongOption)
  }

  private def latestVersion(fs: FileSystem, tableDir: String): Option[Long] = {
    val vs = committedVersions(fs, tableDir)
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())
}
