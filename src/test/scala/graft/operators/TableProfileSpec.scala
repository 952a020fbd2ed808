package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TableProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profiles nulls, distincts, numeric/timestamp/string min-max") {
    val df = Seq(
      (1L, Some(2.0), Some("x"), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, Some(4.0), Some("x"), Some(Timestamp.valueOf("2024-01-02 00:00:00"))),
      (3L, None, None, None)
    ).toDF("id", "v", "s", "ts")
    val out = TableProfile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap

    val id = out("id")
    assert(id.getLong(1) == 0L && id.getLong(2) == 3L)
    assert(id.getDouble(3) == 1.0 && id.getDouble(4) == 3.0)

    val v = out("v")
    assert(v.getLong(1) == 1L && v.getLong(2) == 2L)
    assert(v.getDouble(3) == 2.0 && v.getDouble(4) == 4.0)

    val s = out("s")
    assert(s.getLong(1) == 1L && s.getLong(2) == 1L)
    assert(s.isNullAt(3) && s.isNullAt(4))

    val ts = out("ts")
    assert(ts.getLong(1) == 1L && ts.getLong(2) == 2L)
    // epoch micros of 2024-01-01/02 UTC (session TZ pinned UTC in specs)
    assert(ts.getDouble(3) == 1.7040672e15)
    assert(ts.getDouble(4) == 1.7041536e15)
  }

  test("column subset and approx mode") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("id", "s")
    val out = TableProfile.profile(df, columns = Seq("s"), exact = false)
      .collect()
    assert(out.length == 1)
    val s = out.head
    assert(s.getString(0) == "s")
    assert(s.getLong(1) == 0L)
    // HLL++ on 2 distinct values is exact in practice
    assert(s.getLong(2) == 2L)
  }

  test("single scan: exactly one Exchange in the aggregation plan") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val plan = TableProfile.profile(df)
      .queryExecution.executedPlan.toString
    val n = "Exchange".r.findAllIn(plan).length
    assert(n <= 2, s"profile should be one aggregation pass:\n$plan")
  }
}
