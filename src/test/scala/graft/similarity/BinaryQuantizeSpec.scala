package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinaryQuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    xs.zipWithIndex.foreach { case (x, i) => a(i) = x.toFloat }
    a
  }

  test("signature packs strict sign bits; zero and negative are 0; " +
    "null vector gives null") {
    val df = Seq(
      (1L, Some(vec(1.0, -2.0, 0.0, 3.0))), // bits 0 and 3
      (2L, Some(vec(-1.0))),                // no bits
      (3L, None)
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        BinaryQuantize.signature("embedding").as("sig"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(1L + 8L))
    assert(out(2L).contains(0L))
    assert(out(3L).isEmpty)
  }

  test("hamming counts differing sign bits") {
    val df = Seq((1L, vec(1.0, 1.0, -1.0)), (2L, vec(1.0, -1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val sigs = df.select(BinaryQuantize.signature("embedding"))
      .as[Long].collect()
    val h = spark.range(1).select(
      BinaryQuantize.hamming(lit(sigs(0)), lit(sigs(1)))).as[Int].collect()
    assert(h.head == 2)
  }

  test("with candK covering the corpus, hamming top-k equals brute force " +
    "on real embeddings") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(120).cache()
    val q = e.filter(col("vec_id") < 4)
    val n = e.count().toInt
    val viaHamming = BinaryQuantize.hammingTopK(
        e, q, "vec_id", "embedding", 3, n)
      .select("query_id", "rank", "nn_id")
      .as[(Long, Int, Long)].collect().toSet
    val brute = CosineSearch.bruteForceTopK(e, q, "vec_id", "embedding", 3)
      .select("query_id", "rank", "nn_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(viaHamming == brute)
    e.unpersist()
  }

  test("a tight screen still recovers most true neighbors (recall floor)") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .cache()
    val q = e.filter(col("vec_id") < 8)
    val screened = BinaryQuantize.hammingTopK(
        e, q, "vec_id", "embedding", 3, 24)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val brute = CosineSearch.bruteForceTopK(e, q, "vec_id", "embedding", 3)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = (screened & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low for a 24-candidate screen")
    e.unpersist()
  }
}
