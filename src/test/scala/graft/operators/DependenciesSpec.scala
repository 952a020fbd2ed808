package graft.operators

import graft.SparkSpec

class DependenciesSpec extends SparkSpec {
  import spark.implicits._

  private def emp = Seq(
    (1, "sales", "london", Some(10)),
    (2, "sales", "london", Some(20)),
    (3, "eng", "berlin", Some(10)),
    (4, "eng", "berlin", None),
    (5, "ops", "berlin", Some(30))
  ).toDF("id", "dept", "city", "grade")

  private def fd(pairs: (String, String)*) =
    Dependencies.functionalDeps(emp, pairs)
      .as[(String, String, Long, Long, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap

  test("holding, violated and null-bearing dependencies in one pass") {
    val out = fd(("dept", "city"), ("city", "dept"), ("id", "grade"),
      ("dept", "grade"))
    // dept -> city holds (sales->london, eng->berlin, ops->berlin)
    assert(out(("dept", "city")) === (("dept", "city", 3L, 3L, 0L, true)))
    // city -> dept violated: berlin maps to eng AND ops
    assert(out(("city", "dept")) === (("city", "dept", 2L, 3L, 1L, false)))
    // id -> grade holds, null grade is a real value
    assert(out(("id", "grade")) === (("id", "grade", 5L, 5L, 0L, true)))
    // dept -> grade: sales {10,20}, eng {10,null}, ops {30}
    assert(out(("dept", "grade")) === (("dept", "grade", 3L, 5L, 2L, false)))
  }

  test("null LHS values form their own group") {
    val df = Seq(
      (Option.empty[Int], "a"), (None, "a"), (Some(1), "b"), (Some(1), "b")
    ).toDF("k", "v")
    val out = Dependencies.functionalDeps(df, Seq(("k", "v")))
      .as[(String, String, Long, Long, Long, Boolean)].head()
    assert(out === (("k", "v", 2L, 2L, 0L, true)))
  }

  test("keyCheck separates true keys from duplicated ones") {
    val out = Dependencies.keyCheck(emp,
      Seq(Seq("id"), Seq("dept"), Seq("dept", "city")))
      .as[(String, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("id") === (("id", 5L, 5L, 0L, true)))
    // dept: sales x2, eng x2, ops x1 -> 4 rows share a key
    assert(out("dept") === (("dept", 5L, 3L, 4L, false)))
    assert(out("dept,city") === (("dept,city", 5L, 3L, 4L, false)))
  }

  test("composite key with nulls: null tuples group together") {
    val df = Seq(
      (Some(1), Some("x")), (Some(1), None), (Some(1), None), (Some(2), Some("x"))
    ).toDF("a", "b")
    val out = Dependencies.keyCheck(df, Seq(Seq("a", "b")))
      .as[(String, Long, Long, Long, Boolean)].head()
    assert(out === (("a,b", 4L, 3L, 2L, false)))
  }
}
