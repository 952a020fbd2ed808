package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("lagMatrix: k lags in order, nulls at the head, keys isolated") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 4L, 99.0))
      .map { case (k, s, v) => (k, ts(s), s, v) }.toDF("k", "t", "id", "v")
    val out = Features.lagMatrix(df, "k", "t", "id", "v", 2)
      .select("id", "lag_1", "lag_2")
      .as[(Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((Some(10.0), None)))
    assert(out(3L) == ((Some(20.0), Some(10.0))))
    assert(out(4L) == ((None, None))) // key b sees none of key a
  }

  test("targetEncodeLoo excludes the row's own target") {
    // cat x: targets 10, 20, 30 -> LOO means 25, 20, 15
    val df = Seq((1L, "x", Some(10.0)), (2L, "x", Some(20.0)),
      (3L, "x", Some(30.0)), (4L, "y", Some(7.0)))
      .toDF("id", "cat", "y")
    val out = Features.targetEncodeLoo(df, "cat", "y")
      .select("id", "te_loo").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(25.0))
    assert(out(2L).contains(20.0))
    assert(out(3L).contains(15.0))
    assert(out(4L).isEmpty) // singleton category: nothing to borrow
  }

  test("targetEncodeLoo: null targets encode null but do not poison sums") {
    val df = Seq((1L, "x", Some(10.0)), (2L, "x", None),
      (3L, "x", Some(30.0))).toDF("id", "cat", "y")
    val out = Features.targetEncodeLoo(df, "cat", "y")
      .select("id", "te_loo").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(30.0)) // (40 - 10) / 1
    assert(out(2L).isEmpty)
    assert(out(3L).contains(10.0))
  }

  test("timeSplit labels train/embargo/test around the boundary") {
    val cut = Timestamp.valueOf("2024-01-10 00:00:00")
    val df = Seq(
      (1L, Some(Timestamp.valueOf("2024-01-09 12:00:00"))),
      (2L, Some(Timestamp.valueOf("2024-01-10 00:00:00"))), // boundary: train
      (3L, Some(Timestamp.valueOf("2024-01-11 00:00:00"))), // inside embargo
      (4L, Some(Timestamp.valueOf("2024-01-12 00:00:00"))), // boundary: embargo
      (5L, Some(Timestamp.valueOf("2024-01-12 00:00:01"))), // first test
      (6L, None))
      .toDF("id", "t")
    val out = df.select(col("id"),
      Splits.timeSplit(col("t"), cut, "2 days").as("s"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("train") && out(2L).contains("train"))
    assert(out(3L).contains("embargo") && out(4L).contains("embargo"))
    assert(out(5L).contains("test"))
    assert(out(6L).isEmpty)
  }

  test("hashFeatures: repeated tokens accumulate signed counts in one " +
    "bucket; empty text yields no rows; buckets bounded") {
    val docs = Seq((1L, "tok tok tok"), (2L, ""), (3L, "  "),
      (4L, "tok other tok")).toDF("doc_id", "text")
    val out = Features.hashFeatures(docs, "doc_id", "text", 64)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(r => r._2 >= 0 && r._2 < 64))
    assert(!out.exists(r => r._1 == 2L || r._1 == 3L))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length == 1 && math.abs(d1.head._3) == 3,
      s"'tok tok tok' must be one ±3 bucket, got ${d1.toSeq}")
    // doc 4 shares doc 1's 'tok' bucket with ±2 plus one ±1 bucket
    // (unless 'other' collides, in which case the sum still reconciles)
    val total1 = d1.map(_._3).map(math.abs).sum
    assert(total1 == 3)
  }

  test("hashFeatures is deterministic across partitionings and dims " +
    "changes only the bucket space") {
    val docs = (0 until 50).map(i =>
      (i.toLong, s"w${i % 7} w${i % 11} shared tail")).toDF("doc_id", "text")
    val a = Features.hashFeatures(docs, "doc_id", "text", 32)
      .as[(Long, Long, Long)].collect().toSet
    val b = Features.hashFeatures(docs.repartition(9), "doc_id", "text", 32)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.forall(r => r._2 >= 0 && r._2 < 32))
    // total signed mass is invariant to dims (collisions only merge)
    val m32 = a.toSeq.map(_._3).sum
    val m8 = Features.hashFeatures(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long)].collect().map(_._3).sum
    assert(m32 == m8)
  }

  test("quantileNormalize: hand-computed grid and per-source mapping") {
    // A = [1,2,3,4], B = [10,20]; pooled = 1,2,3,4,10,20 (N=6), q=4:
    // grid p=1..4 -> pooled ranks ceil(p*6/4) = 2,3,5,6 -> 2,3,10,20
    val rows = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 3L, 3L),
      ("A", 4L, 4L), ("B", 5L, 10L), ("B", 6L, 20L))
      .toDF("src", "id", "v")
    val out = Features.quantileNormalize(rows, "src", "v", "id", 4)
      .select("id", "qn_pos", "qn")
      .as[(Long, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // A: rank r -> p = r; B: ranks 1,2 -> p = 2, 4
    assert(out(1L) === ((1, 2L)) && out(2L) === ((2, 3L)))
    assert(out(3L) === ((3, 10L)) && out(4L) === ((4, 20L)))
    assert(out(5L) === ((2, 3L)) && out(6L) === ((4, 20L)))
  }

  test("quantileNormalize: identical sources map onto themselves") {
    // one source: the map is the identity on values (p-th grid point
    // IS the p-th order statistic when q = n)
    val rows = (1 to 8).map(i => ("s", i.toLong, (i * 3).toLong))
      .toDF("src", "id", "v")
    val out = Features.quantileNormalize(rows, "src", "v", "id", 8)
      .select("v", "qn").as[(Long, Long)].collect()
    assert(out.forall(r => r._1 === r._2))
  }

  test("quantileNormalize: ties split deterministically by the tie col") {
    val rows = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("b", 3L, 7L),
      ("b", 4L, 7L)).toDF("src", "id", "v")
    val out = Features.quantileNormalize(rows, "src", "v", "id", 2)
      .select("id", "qn_pos").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2))
    val again = Features.quantileNormalize(rows.repartition(5), "src",
        "v", "id", 2)
      .select("id", "qn_pos").as[(Long, Int)].collect().toMap
    assert(again === out)
  }
}
