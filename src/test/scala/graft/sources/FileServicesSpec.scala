package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class FileServicesSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("filesvc").toString

  private def write(path: String, content: String): Unit =
    Files.write(Paths.get(path), content.getBytes("UTF-8"))

  private def readBack(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  test("createFolder creates and tolerates existing folders") {
    val base = tmpDir()
    val target = s"$base/new/nested"
    FileServices.createFolder(spark, target)
    assert(Files.isDirectory(Paths.get(target)))
    FileServices.createFolder(spark, target) // second call: not an error
    assert(Files.isDirectory(Paths.get(target)))
  }

  test("moveFiles relocates each pair and deletes the source") {
    val base = tmpDir()
    Files.createDirectories(Paths.get(s"$base/in"))
    Files.createDirectories(Paths.get(s"$base/done"))
    write(s"$base/in/a.csv", "x,y\n1,2\n")
    write(s"$base/in/b.csv", "x,y\n3,4\n")
    FileServices.moveFiles(spark, Seq(
      (s"$base/in/a.csv", s"$base/done/a.csv"),
      (s"$base/in/b.csv", s"$base/done/b.csv")))
    assert(!Files.exists(Paths.get(s"$base/in/a.csv")))
    assert(readBack(s"$base/done/a.csv") == "x,y\n1,2\n")
    assert(readBack(s"$base/done/b.csv") == "x,y\n3,4\n")
  }

  test("moveFiles keeps the source when deleteSource is false") {
    val base = tmpDir()
    write(s"$base/keep.txt", "payload")
    FileServices.moveFiles(spark,
      Seq((s"$base/keep.txt", s"$base/copy.txt")), deleteSource = false)
    assert(readBack(s"$base/keep.txt") == "payload")
    assert(readBack(s"$base/copy.txt") == "payload")
  }

  test("moveFiles names the unreadable source like the reference") {
    val base = tmpDir()
    val e = intercept[RuntimeException] {
      FileServices.moveFiles(spark,
        Seq((s"$base/absent.txt", s"$base/out.txt")))
    }
    assert(e.getMessage.contains(s""""$base/absent.txt""""))
  }

  test("lastWriteTime reflects modification order") {
    val base = tmpDir()
    write(s"$base/old.txt", "1")
    val t1 = FileServices.lastWriteTime(spark, s"$base/old.txt")
    Thread.sleep(20)
    write(s"$base/new.txt", "2")
    val t2 = FileServices.lastWriteTime(spark, s"$base/new.txt")
    assert(!t2.before(t1))
  }

  test("list returns direct child names") {
    val base = tmpDir()
    write(s"$base/f1.txt", "")
    write(s"$base/f2.txt", "")
    assert(FileServices.list(spark, base).toSet == Set("f1.txt", "f2.txt"))
  }
}
