package graft.operators

import graft.SparkSpec

class LabelEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("ids are dense, 1-based, in value order; nulls keep a null id") {
    val df = Seq(Some("cherry"), Some("apple"), None, Some("banana"),
      Some("apple")).toDF("v")
    val out = Discretize.labelEncode(df, "v")
      .as[(Option[String], Option[Long])].collect().toSet
    assert(out == Set(
      (Some("apple"), Some(1L)), (Some("banana"), Some(2L)),
      (Some("cherry"), Some(3L)), (None, None)))
  }

  test("ids are stable across partitionings and row order") {
    val vals = (1 to 200).map(i => s"v${i % 37}")
    val a = Discretize.labelEncode(vals.toDF("v"), "v")
      .as[(String, Long)].collect().toSet
    val b = Discretize.labelEncode(
      vals.reverse.toDF("v").repartition(11), "v")
      .as[(String, Long)].collect().toSet
    assert(a == b)
  }

  test("row multiplicity is preserved") {
    val df = Seq("x", "x", "y").toDF("v")
    assert(Discretize.labelEncode(df, "v").count() == 3)
  }
}
