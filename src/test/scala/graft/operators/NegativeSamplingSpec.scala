package graft.operators

import graft.SparkSpec

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L).map(i => (i, s"doc$i")).toDF("id", "body")

  test("every anchor draws exactly k partners, none itself") {
    val out = NegativeSampling.ringNegatives(docs, "id", k = 3, nBuckets = 4)
      .as[(Long, Int, Long)].collect()
    assert(out.length == 200 * 3)
    assert(out.forall { case (a, _, n) => a != n })
    val perAnchor = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(perAnchor.values.forall(_ == Seq(1, 2, 3)))
  }

  test("deterministic across reruns and partitionings") {
    val a = NegativeSampling.ringNegatives(docs, "id", 2, 4)
      .as[(Long, Int, Long)].collect().toSet
    val b = NegativeSampling.ringNegatives(docs.repartition(13), "id", 2, 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
  }

  test("single-row corpus yields no pairs; two rows pair each other") {
    val one = Seq((1L, "x")).toDF("id", "body")
    assert(NegativeSampling.ringNegatives(one, "id", 2, 1).count() == 0)
    val two = Seq((1L, "x"), (2L, "y")).toDF("id", "body")
    val out = NegativeSampling.ringNegatives(two, "id", 2, 1)
      .as[(Long, Int, Long)].collect()
    assert(out.length == 4)
    assert(out.forall { case (a, _, n) => (a == 1L && n == 2L) || (a == 2L && n == 1L) })
  }

  test("draws vary the partner (with-replacement, but hash-spread)") {
    // With k=8 over a 200-doc corpus the 8 offsets for one anchor are
    // md5-derived — statistically they cannot all coincide.
    val out = NegativeSampling.ringNegatives(docs, "id", 8, 2)
      .as[(Long, Int, Long)].collect()
    val distinctPartners = out.groupBy(_._1).map(_._2.map(_._3).distinct.size)
    assert(distinctPartners.max > 1)
  }
}
