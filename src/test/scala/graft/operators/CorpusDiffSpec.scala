package graft.operators

import graft.SparkSpec

/** CorpusDiff — snapshot change detection by content fingerprint:
  * statuses, normalization-insensitivity, and the changedRows handoff. */
class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "alpha beta gamma"),
    (2L, "delta epsilon"),
    (3L, "zeta eta theta"),
    (4L, "iota kappa")
  ).toDF("doc_id", "text")

  private def newSnap = Seq(
    (1L, "alpha beta gamma"),      // unchanged
    (2L, "delta epsilon REVISED"), // changed
    // 3 removed
    (4L, "  Iota   KAPPA  "),      // whitespace/case only -> NOT a change
    (5L, "brand new doc")          // added
  ).toDF("doc_id", "text")

  test("diff reports added/removed/changed and omits unchanged") {
    val d = CorpusDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(d == Set((2L, "changed"), (3L, "removed"), (5L, "added")))
  }

  test("normalization-equivalent rewrites are not changes") {
    val d = CorpusDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .filter($"doc_id" === 4L)
    assert(d.isEmpty)
  }

  test("changedRows hands downstream the added+changed new rows, full columns") {
    val rows = CorpusDiff.changedRows(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(rows == Set(
      (2L, "delta epsilon REVISED"), (5L, "brand new doc")))
  }

  test("NULL text is presence, not absence") {
    val o = Seq((1L, Option("alpha")), (2L, Option.empty[String]),
      (3L, Option("gamma")), (4L, Option.empty[String]))
      .toDF("doc_id", "text")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (4L, Option("now real")))
      .toDF("doc_id", "text")
    val d = CorpusDiff.diff(o, n, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    // 1: text -> NULL is a CHANGE (not a removal); 2: NULL in both is
    // unchanged; 3: removed; 4: NULL -> text is a change
    assert(d == Set((1L, "changed"), (3L, "removed"), (4L, "changed")))
  }

  test("empty old snapshot marks everything added; empty new marks removed") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val allAdded = CorpusDiff.diff(empty, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(allAdded.map(_._2) == Set("added") && allAdded.size == 4)
    val allRemoved = CorpusDiff.diff(oldSnap, empty, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(allRemoved.map(_._2) == Set("removed") && allRemoved.size == 4)
  }
}
