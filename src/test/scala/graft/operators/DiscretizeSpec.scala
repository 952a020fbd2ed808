package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiscretizeSpec extends SparkSpec {
  import spark.implicits._

  private def bins(n: Int, k: Int): Map[Long, Int] =
    Discretize.equalFrequency(
      (1 to n).map(i => ("g", i.toLong, i.toDouble)).toDF("k", "id", "v"),
      "k", "v", "id", k)
      .select("id", "bin").as[(Long, Option[Int])].collect()
      .map(r => r._1 -> r._2.get).toMap

  test("even split: n divisible by k") {
    val b = bins(10, 5)
    assert((1 to 10).map(b(_)) == Seq(1, 1, 2, 2, 3, 3, 4, 4, 5, 5))
  }

  test("ntile contract: larger buckets come first") {
    val b = bins(10, 4) // 3,3,2,2
    assert((1 to 10).map(b(_)) == Seq(1, 1, 1, 2, 2, 2, 3, 3, 4, 4))
  }

  test("fewer rows than bins: one row per leading bucket") {
    val b = bins(3, 10)
    assert((1 to 3).map(b(_)) == Seq(1, 2, 3))
  }

  test("matches Spark's native ntile when no nulls are present") {
    val df = (1 to 97).map(i =>
      ("g", i.toLong, (i * 37 % 100).toDouble)).toDF("k", "id", "v")
    val ours = Discretize.equalFrequency(df, "k", "v", "id", 7)
      .select("id", "bin").as[(Long, Option[Int])].collect()
      .map(r => r._1 -> r._2.get).toMap
    val theirs = df.withColumn("bin", ntile(7).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
        .orderBy(col("v"), col("id"))))
      .select("id", "bin").as[(Long, Int)].collect().toMap
    assert(ours == theirs)
  }

  test("nulls get a null bin and do not shift boundaries") {
    val df = Seq(("g", 1L, Some(1.0)), ("g", 2L, None), ("g", 3L, Some(2.0)),
      ("g", 4L, Some(3.0)), ("g", 5L, Some(4.0)))
      .toDF("k", "id", "v")
    val out = Discretize.equalFrequency(df, "k", "v", "id", 2)
      .select("id", "bin").as[(Long, Option[Int])].collect().toMap
    assert(out(2L).isEmpty)
    // 4 non-null rows over 2 bins -> 2+2, unaffected by the null row
    assert(out(1L).contains(1) && out(3L).contains(1))
    assert(out(4L).contains(2) && out(5L).contains(2))
  }

  test("groups bin independently") {
    val df = ((1 to 4).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 8).map(i => ("b", 100L + i, i.toDouble))).toDF("k", "id", "v")
    val out = Discretize.equalFrequency(df, "k", "v", "id", 2)
      .select("k", "id", "bin").as[(String, Long, Option[Int])].collect()
    assert(out.filter(_._1 == "a").count(_._3.contains(1)) == 2)
    assert(out.filter(_._1 == "b").count(_._3.contains(1)) == 4)
  }
}
