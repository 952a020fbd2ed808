package graft.operators

import graft.SparkSpec

class GoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // key 1: A misses phone, B has it; A's name wins
    (1L, 1, "a", Some("Alice"), None),
    (1L, 2, "b", Some("ALICE DOE"), Some("555-1")),
    // key 2: only B
    (2L, 2, "b", Some("Bob"), Some("555-2")),
    // key 3: field missing everywhere stays null
    (3L, 1, "a", None, None),
    (3L, 2, "b", Some("Carol"), None))
    .toDF("k", "prio", "src", "name", "phone")

  test("fields survive from the best source that has them") {
    val out = GoldenRecord.merge(rows, "k", "prio", "src",
      Seq("name", "phone"))
      .as[(Long, Option[String], Option[String], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((Some("Alice"), Some("555-1"), 2L)))
    assert(out(2L) == ((Some("Bob"), Some("555-2"), 1L)))
    assert(out(3L) == ((Some("Carol"), None, 2L)))
    assert(out.size == 3)
  }

  test("priority ties resolve deterministically by the tie column") {
    val tied = Seq(
      (1L, 1, "a", Some("fromA")), (1L, 1, "b", Some("fromB")))
      .toDF("k", "prio", "src", "name")
    val out = GoldenRecord.merge(tied, "k", "prio", "src", Seq("name"))
      .as[(Long, Option[String], Long)].collect().head
    assert(out == ((1L, Some("fromA"), 2L)))
  }

  test("output is one row per key regardless of partitioning") {
    val big = (1 to 300).map(i =>
      (i.toLong % 50, i % 3 + 1, s"s$i", Some(s"v$i")))
      .toDF("k", "prio", "src", "name")
    val out = GoldenRecord.merge(big.repartition(7), "k", "prio", "src",
      Seq("name"))
    assert(out.count() == 50)
    assert(out.select("k").distinct().count() == 50)
  }
}
