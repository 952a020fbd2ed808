package graft.operators

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: k above the key cardinality reproduces plain counts") {
    val rows = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c")
    val df = rows.toDF("k").repartition(4)
    val r = HeavyHitters.heavyHitters(df, Nil, "k", 16)
      .as[(String, Long, Long)].collect().toSet
    assert(r == Set(("a", 30L, 0L), ("b", 20L, 0L), ("c", 5L, 0L)))
  }

  test("per-group summaries stay independent") {
    val df = (Seq.fill(4)((1L, "x")) ++ Seq.fill(2)((1L, "y")) ++
      Seq.fill(9)((2L, "y"))).toDF("g", "k").repartition(3)
    val r = HeavyHitters.heavyHitters(df, Seq("g"), "k", 8)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(r == Set((1L, "x", 4L, 0L), (1L, "y", 2L, 0L), (2L, "y", 9L, 0L)))
  }

  test("null keys are excluded, not counted as a frequent value") {
    val df = Seq(Some("a"), None, Some("a"), None, None).toDF("k")
    val r = HeavyHitters.heavyHitters(df, Nil, "k", 4)
      .as[(String, Long, Long)].collect().toSet
    assert(r == Set(("a", 2L, 0L)))
  }

  test("approximate regime: the dominant key survives with bounded undercount") {
    // 900 of 'hot' among 300 distinct cold keys, k = 16: any key with
    // freq > n/(k+1) = 1200/17 ~ 70 MUST be present, and estimates only
    // undercount, by at most the reported err_bound <= n/(k+1)
    val rows = Seq.fill(900)("hot") ++ (1 to 300).map(i => s"cold_$i")
    val df = rows.toDF("k").repartition(8)
    val r = HeavyHitters.heavyHitters(df, Nil, "k", 16)
      .as[(String, Long, Long)].collect()
    val n = rows.size
    val hot = r.find(_._1 == "hot").get
    assert(hot._2 <= 900L && 900L - hot._2 <= hot._3)
    assert(r.forall(_._3 <= n / 17 + 1))
    assert(r.forall { case (k, est, _) =>
      est <= rows.count(_ == k) // never overcounts
    })
  }

  test("summary size never exceeds k") {
    val rows = (1 to 500).map(i => s"k${i % 97}")
    val df = rows.toDF("k").repartition(8)
    assert(HeavyHitters.heavyHitters(df, Nil, "k", 5).count() <= 5L)
  }
}
