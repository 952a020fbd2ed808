package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Atomic small-file IO on the Hadoop FS — marker and manifest files
  * (`_LSH_PARAMS`, `_MANIFEST.json`) that must never be observed torn:
  * a crash between create and close would otherwise leave a partial
  * file that poisons every subsequent read (a guard that crash-loops is
  * worse than no guard). Writes go to a dot-prefixed temp sibling and
  * rename into place — rename is the FS-atomic primitive, the same
  * discipline `AtomicParquet` applies to data directories. */
object SmallFiles {

  def write(fs: FileSystem, target: HPath, text: String): Unit = {
    val tmp = new HPath(target.getParent, s".${target.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8)) finally out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"atomic rename to $target failed")
    }
  }

  def read(fs: FileSystem, target: HPath): String = {
    val in = fs.open(target)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }
}
