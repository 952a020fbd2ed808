package graft.operators

import graft.SparkSpec

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("classifies ok / mismatch / missing on both sides") {
    val src = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val dst = Seq((1L, "a", 10.0), (2L, "b", 21.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val out = Reconcile.diff(src, dst, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "ok", 2L -> "mismatch", 3L -> "missing_dst",
      4L -> "missing_src"))
  }

  test("null vs empty-string vs absent are distinct fingerprints") {
    val src = Seq((1L, Some("")), (2L, Option.empty[String]), (3L, Some("x")))
      .toDF("k", "v")
    val dst = Seq((1L, Option.empty[String]), (2L, Some("")), (3L, Some("x")))
      .toDF("k", "v")
    val out = Reconcile.diff(src, dst, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "mismatch", 2L -> "mismatch", 3L -> "ok"))
  }

  test("adjacent values cannot re-segment into a colliding fingerprint") {
    // ("a","1b") vs ("a1","b"): a tag-only concat encodes both as the
    // same byte stream; the length-prefixed blocks must not.
    val src = Seq((1L, "a", "1b")).toDF("k", "c1", "c2")
    val dst = Seq((1L, "a1", "b")).toDF("k", "c1", "c2")
    val out = Reconcile.diff(src, dst, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "mismatch"))
  }

  test("compare column subset ignores excluded drift") {
    val src = Seq((1L, "a", 1.0)).toDF("k", "name", "v")
    val dst = Seq((1L, "a", 2.0)).toDF("k", "name", "v")
    val only = Reconcile.diff(src, dst, Seq("k"), compareCols = Seq("name"))
      .as[(Long, String)].collect().toMap
    assert(only == Map(1L -> "ok"))
  }

  test("composite key and summary counts") {
    val src = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k1", "k2", "v")
    val dst = Seq((1L, 1L, "a"), (1L, 3L, "c")).toDF("k1", "k2", "v")
    val sum = Reconcile.summary(src, dst, Seq("k1", "k2"))
      .as[(String, Long)].collect().toMap
    assert(sum == Map("ok" -> 1L, "missing_dst" -> 1L, "missing_src" -> 1L))
  }

  test("changelog emits I/U with new values, D with old values") {
    val oldSnap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val newSnap = Seq((1L, "a", 10.0), (2L, "b", 21.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val out = Reconcile.changelog(oldSnap, newSnap, Seq("k"))
      .as[(Long, String, String, Double)].collect().toSet
    assert(out == Set(
      (2L, "U", "b", 21.0), // new value
      (3L, "D", "c", 30.0), // old value
      (4L, "I", "d", 40.0)))
  }

  test("changelog of identical snapshots is empty") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(Reconcile.changelog(snap, snap, Seq("k")).count() == 0L)
  }

  test("fingerprints shrink the join: plan projects only key + digest") {
    val src = Seq((1L, "a", 1.0, "wide1"), (2L, "b", 2.0, "wide2"))
      .toDF("k", "name", "v", "blob")
    val dst = src
    val plan = Reconcile.diff(src, dst, Seq("k"))
      .queryExecution.executedPlan.toString
    // The join output must not carry the raw value columns.
    assert(!plan.contains("SortMergeJoin") ||
      !plan.linesIterator.exists(l => l.contains("SortMergeJoin") && l.contains("blob")),
      plan)
  }

  test("signature is order- and partitioning-independent") {
    val df = (1 to 500).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    val a = Reconcile.signature(df, Seq("id", "name"))
      .as[(Long, Long)].collect().head
    val b = Reconcile.signature(
      df.orderBy(org.apache.spark.sql.functions.col("name").desc)
        .repartition(13), Seq("id", "name"))
      .as[(Long, Long)].collect().head
    assert(a == b)
  }

  test("signature detects a single changed cell, a dropped row, a dup") {
    val base = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val sig = Reconcile.signature(base, Seq("id", "v"))
      .as[(Long, Long)].collect().head
    val changed = (1 to 100).map(i =>
      (i.toLong, if (i == 50) "vX" else s"v$i")).toDF("id", "v")
    val dropped = (1 to 99).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val duped = ((1 to 100) :+ 7).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    assert(Reconcile.signature(changed, Seq("id", "v"))
      .as[(Long, Long)].collect().head != sig)
    assert(Reconcile.signature(dropped, Seq("id", "v"))
      .as[(Long, Long)].collect().head != sig)
    assert(Reconcile.signature(duped, Seq("id", "v"))
      .as[(Long, Long)].collect().head != sig)
  }

  test("signature distinguishes null from empty string") {
    val a = Seq((1L, Some(""))).toDF("id", "v")
    val b = Seq((1L, Option.empty[String])).toDF("id", "v")
    assert(Reconcile.signature(a, Seq("id", "v"))
      .as[(Long, Long)].collect().head !=
      Reconcile.signature(b, Seq("id", "v"))
        .as[(Long, Long)].collect().head)
  }
}
