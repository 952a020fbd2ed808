package graft.operators

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("median, MAD, and flags on a known group") {
    // values 1..9 plus a gross outlier 1000 (n=10):
    // rank-select median = value at rank ceil(0.5*10)=5 -> 5.0;
    // absdevs = {4,3,2,1,0,1,2,3,4,995}, sorted rank 5 -> 2.0 = MAD;
    // |x-5| > 3*2=6 flags only 1000.
    val df = ((1 to 9).map(i => (i.toLong, "g", i.toDouble)) :+
      (10L, "g", 1000.0)).toDF("id", "k", "v")
    val out = Robust.madOutliers(df, "k", "v", "id", 3.0)
      .select("id", "med", "mad", "is_outlier")
      .as[(Long, Double, Double, Boolean)].collect()
    assert(out.forall(r => r._2 == 5.0 && r._3 == 2.0))
    assert(out.filter(_._4).map(_._1).toSeq == Seq(10L))
  }

  test("groups are independent and nulls are excluded") {
    val df = Seq(
      (1L, "a", Some(1.0)), (2L, "a", Some(2.0)), (3L, "a", Some(3.0)),
      (4L, "a", None),
      (5L, "b", Some(100.0)), (6L, "b", Some(200.0)), (7L, "b", Some(300.0)))
      .toDF("id", "k", "v")
    val out = Robust.madOutliers(df, "k", "v", "id", 3.0)
      .select("id", "k", "med", "mad")
      .as[(Long, String, Double, Double)].collect()
    assert(out.length == 6) // the null row is gone
    assert(out.filter(_._2 == "a").forall(r => r._3 == 2.0 && r._4 == 1.0))
    assert(out.filter(_._2 == "b").forall(r => r._3 == 200.0 && r._4 == 100.0))
  }

  test("constant group has MAD 0 and any deviation flags") {
    val df = (Seq.fill(5)(7.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, "c", v) } :+ (99L, "c", 7.5)).toDF("id", "k", "v")
    val out = Robust.madOutliers(df, "k", "v", "id", 3.0)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(99L)) // 0.5 > 3*0 — MAD-0 groups flag every deviation
    assert(!out(0L))
  }
}
