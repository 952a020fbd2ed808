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

  private def summarize(items: Seq[(String, String)], k: Int) =
    HeavyHitters.heavyHitters(items.toDF("g", "i"), Seq("g"), "i", k)

  private def asMG(rows: Seq[(String, Long, Long)]): HeavyHitters.MG =
    HeavyHitters.MG(
      scala.collection.mutable.Map(rows.map(r => r._1 -> r._2): _*),
      rows.headOption.map(_._3).getOrElse(0L))

  test("table merge is bit-identical to the in-memory Agarwal merge") {
    val k = 3
    val b1 = Seq.fill(9)("x") ++ Seq.fill(6)("y") ++ Seq.fill(4)("z") ++
      Seq("p", "q", "r", "s") // forces decrements in batch 1
    val b2 = Seq.fill(7)("y") ++ Seq.fill(5)("w") ++ Seq.fill(3)("x") ++
      Seq("t", "u")
    def table(items: Seq[String]) =
      summarize(items.map(("g", _)), k)
    val merged = HeavyHitters.mergeSummaryTables(
      table(b1), table(b2), Seq("g"), k)
      .select("item", "est", "err_bound")
      .as[(String, Long, Long)].collect().toSet
    val s1 = table(b1).select("item", "est", "err_bound")
      .as[(String, Long, Long)].collect().toSeq
    val s2 = table(b2).select("item", "est", "err_bound")
      .as[(String, Long, Long)].collect().toSeq
    val reference = asMG(s1).mergeWith(asMG(s2), k).result.toSet
    assert(merged == reference)
  }

  test("table merge in the exact regime reproduces union counts, err 0") {
    val k = 10
    def table(items: Seq[String]) = summarize(items.map(("g", _)), k)
    val b1 = Seq.fill(5)("a") ++ Seq.fill(3)("b")
    val b2 = Seq.fill(2)("a") ++ Seq.fill(4)("c")
    val merged = HeavyHitters.mergeSummaryTables(
      table(b1), table(b2), Seq("g"), k)
      .select("item", "est", "err_bound")
      .as[(String, Long, Long)].collect().toSet
    assert(merged == Set(("a", 7L, 0L), ("b", 3L, 0L), ("c", 4L, 0L)))
  }

  test("table merge handles groups present on only one side") {
    val k = 4
    val t1 = summarize(Seq(("g1", "a"), ("g1", "a"), ("g2", "b")), k)
    val t2 = summarize(Seq(("g1", "a"), ("g3", "c")), k)
    val merged = HeavyHitters.mergeSummaryTables(t1, t2, Seq("g"), k)
      .select("g", "item", "est", "err_bound")
      .as[(String, String, Long, Long)].collect().toSet
    assert(merged == Set(("g1", "a", 3L, 0L), ("g2", "b", 1L, 0L),
      ("g3", "c", 1L, 0L)))
  }

  test("global (ungrouped) table merge applies the cut") {
    val k = 2
    def table(items: Seq[String]) =
      HeavyHitters.heavyHitters(items.toDF("i"), Seq.empty, "i", k)
    // summaries: b1 -> {x:5, y:3}, b2 -> {x:2, z:4}; summed {x:7,z:4,y:3}
    // cut = 3rd largest = 3 -> {x:4, z:1}, err 3
    val b1 = Seq.fill(5)("x") ++ Seq.fill(3)("y")
    val b2 = Seq.fill(2)("x") ++ Seq.fill(4)("z")
    val merged = HeavyHitters.mergeSummaryTables(
      table(b1), table(b2), Seq.empty, k)
      .select("item", "est", "err_bound")
      .as[(String, Long, Long)].collect().toSet
    assert(merged == Set(("x", 4L, 3L), ("z", 1L, 3L)))
  }
}
