package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, if (i % 5 == 0) "en" else "de"))
      .toDF("id", "lang")
  }

  test("hash sampling is deterministic and partitioning-independent") {
    val d = docs(2000)
    val once = d.filter(Sampling.hashSample(col("id"), 0.3))
      .select("id").collect().map(_.getLong(0)).toSet
    val again = d.repartition(13).filter(Sampling.hashSample(col("id"), 0.3))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(once == again)
    assert(once.nonEmpty && once.size < 2000)
  }

  test("sample rate lands near the requested fraction") {
    val kept = docs(5000).filter(Sampling.hashSample(col("id"), 0.3)).count()
    assert(math.abs(kept / 5000.0 - 0.3) < 0.03, s"kept $kept of 5000")
  }

  test("stratified rates apply per stratum; default covers the rest") {
    val d = docs(5000) // 1000 en, 4000 de
    val s = Sampling.stratifiedSample(d, "id", "lang",
      Map("en" -> 0.5), defaultRate = 1.0)
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 4000L) // default rate 1.0 keeps everything
    assert(math.abs(byLang("en") / 1000.0 - 0.5) < 0.06)
  }

  test("fractional rate*buckets floors (never rounds) the bucket cutoff") {
    // rate 0.15 at 10 buckets -> cutoff 1.5: floor keeps bucket {0} only,
    // rounding would keep {0,1} — roughly double the sample
    val d = docs(5000)
    val kept = Sampling.stratifiedSample(d, "id", "lang",
      Map("en" -> 0.15), defaultRate = 0.0, buckets = 10)
    val expected = d.filter(col("lang") === "en")
      .filter(Sampling.hashBucket(col("id"), 10) < 1)
      .select("id").collect().map(_.getLong(0)).toSet
    val got = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    val ifRounded = d.filter(col("lang") === "en")
      .filter(Sampling.hashBucket(col("id"), 10) < 2).count()
    assert(ifRounded > got.size, "fixture must distinguish floor from round")
  }

  test("rate 1.0 keeps every row") {
    assert(docs(500).filter(Sampling.hashSample(col("id"), 1.0)).count() == 500)
  }

  test("rebalanceToMixture hits the target shares at max output size") {
    val d = docs(5000) // 1000 en, 4000 de
    // target 50/50: en is limiting (1000/0.5 = 2000 = T) -> keep all en,
    // downsample de to ~1000
    val out = Sampling.rebalanceToMixture(d, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.5))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 1000L, "limiting stratum must keep everything")
    assert(math.abs(byLang("de") - 1000.0) / 1000.0 < 0.06,
      s"de should downsample to ~1000, got ${byLang("de")}")
  }

  test("rebalanceToMixture drops strata without a weight") {
    val d = docs(1000)
    val out = Sampling.rebalanceToMixture(d, "id", "lang", Map("en" -> 1.0))
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSeq
      === Seq("en"))
  }

  test("weightedSample keeps per-row probability, clamped, null-dropping") {
    val d = docs(1000)
    // rate 1 keeps all; rate 0 and NULL drop all; rates above 1 clamp
    assert(Sampling.weightedSample(d, "id", lit(1.0)).count() == 1000)
    assert(Sampling.weightedSample(d, "id", lit(5.0)).count() == 1000)
    assert(Sampling.weightedSample(d, "id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(d, "id", lit(-3.0)).count() == 0)
    assert(Sampling.weightedSample(d, "id",
      lit(null).cast("double")).count() == 0)
    // a 30% rate lands near 30% (hash-uniformity, not exactness)
    val n = Sampling.weightedSample(d, "id", lit(0.3)).count()
    assert(math.abs(n - 300.0) / 300.0 < 0.15, s"expected ~300, got $n")
  }

  test("keepTopFraction keeps exactly ceil(frac*n) per stratum, best first") {
    import spark.implicits._
    val d = Seq(
      ("en", 1L, 0.9), ("en", 2L, 0.8), ("en", 3L, 0.7), ("en", 4L, 0.6),
      ("en", 5L, 0.5),
      ("de", 6L, 0.4), ("de", 7L, 0.3), ("de", 8L, 0.2)
    ).toDF("lang", "id", "score")
    val kept = Sampling.keepTopFraction(d, "id", "score", Seq("lang"), 0.5)
      .select($"id").as[Long].collect().toSet
    // en: ceil(0.5*5)=3 -> ids 1,2,3; de: ceil(0.5*3)=2 -> ids 6,7
    assert(kept == Set(1L, 2L, 3L, 6L, 7L))
  }

  test("keepTopFraction breaks score ties by id, deterministically") {
    import spark.implicits._
    val d = Seq(("x", 10L, 1.0), ("x", 11L, 1.0), ("x", 12L, 1.0))
      .toDF("lang", "id", "score")
    val kept = Sampling.keepTopFraction(d, "id", "score", Seq("lang"), 0.34)
      .select($"id").as[Long].collect().toSeq
    // ceil(0.34*3)=2: lowest ids win among equal scores
    assert(kept.sorted == Seq(10L, 11L))
  }

  test("keepTopFraction threshold is decimal-exact, not double-noisy") {
    import spark.implicits._
    // 0.07 * 100 in IEEE double is 7.000000000000001 -> a double ceil
    // keeps 8; the decimal threshold must keep exactly 7
    val d = (1 to 100).map(i => ("en", i.toLong, (101 - i) / 100.0))
      .toDF("lang", "id", "score")
    val kept = Sampling.keepTopFraction(d, "id", "score", Seq("lang"), 0.07)
    assert(kept.count() == 7, s"expected ceil(0.07*100)=7, got ${kept.count()}")
  }

  test("keepTopFraction excludes NULL scores from count and keep set") {
    import spark.implicits._
    val d = Seq(
      ("en", 1L, Some(0.9)), ("en", 2L, Some(0.8)), ("en", 3L, Some(0.7)),
      ("en", 4L, Some(0.6)),
      ("en", 5L, None), ("en", 6L, None), ("en", 7L, None),
      ("en", 8L, None), ("en", 9L, None), ("en", 10L, None)
    ).toDF("lang", "id", "score")
    val kept = Sampling.keepTopFraction(d, "id", "score", Seq("lang"), 0.5)
      .select($"id").as[Long].collect().toSet
    // n = 4 scored rows (not 10): ceil(0.5*4) = 2, and no unscored row
    // may pass a quality selection
    assert(kept == Set(1L, 2L))
  }

  test("cutoffForKeepRate over-keeps under tie mass at the cutoff (documented)") {
    import spark.implicits._
    // 90% of scores are the clamped max: the 0.9-quantile IS that value
    // and >= keeps everything — the documented failure mode that argues
    // for keepTopFraction when scores are coarse
    val d = (1 to 1000).map(i =>
      ("en", i.toLong, if (i <= 100) i / 1000.0 else 1.0))
      .toDF("lang", "id", "score")
    val c = Sampling.cutoffForKeepRate(d, "score", Seq("lang"), 0.1)
      .select($"cutoff").as[Double].head()
    assert(d.filter($"score" >= c).count() >= 900)
  }

  test("cutoffForKeepRate's cutoff filters to roughly the target rate") {
    import spark.implicits._
    val d = (1 to 1000).map(i => ("en", i.toLong, i / 1000.0))
      .toDF("lang", "id", "score")
    val cut = Sampling.cutoffForKeepRate(d, "score", Seq("lang"), 0.25)
    val c = cut.select($"cutoff").as[Double].head()
    val kept = d.filter($"score" >= c).count()
    assert(math.abs(kept - 250.0) / 250.0 < 0.05,
      s"cutoff $c kept $kept of 1000, wanted ~250")
  }

  test("weightedSample is deterministic and monotone in the rate") {
    val d = docs(800)
    val a = Sampling.weightedSample(d, "id", lit(0.4))
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(d, "id", lit(0.4))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same rate must select the same rows")
    val wider = Sampling.weightedSample(d, "id", lit(0.7))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider), "raising the rate must only add rows")
  }

  test("worSample: exactly k per stratum, partitioning-independent, " +
    "nonpositive/null weights excluded") {
    import spark.implicits._
    val d = (0 until 400).map(i => (i.toLong,
        if (i % 4 == 0) "en" else "de",
        if (i % 50 == 0) None else Some((i % 13 + 1).toLong)))
      .toDF("id", "lang", "w")
    val one = Sampling.worSample(d, "id", "lang", "w", 7)
      .select("lang", "rank", "id").as[(String, Int, Long)].collect().toSet
    val many = Sampling.worSample(d.repartition(11), "id", "lang", "w", 7)
      .select("lang", "rank", "id").as[(String, Int, Long)].collect().toSet
    assert(one == many)
    assert(one.count(_._1 == "en") == 7 && one.count(_._1 == "de") == 7)
    // the null-weight ids (i % 50 == 0) can never be selected
    assert(one.forall(_._3 % 50 != 0))
    val withZero = (0 until 20).map(i => (i.toLong, "k",
        if (i < 10) 0L else 5L)).toDF("id", "lang", "w")
    val sel = Sampling.worSample(withZero, "id", "lang", "w", 15)
      .select("id").as[Long].collect().toSet
    assert(sel == (10L until 20L).toSet, "zero weights must be excluded")
  }

  test("worSample: selection probability grows with weight") {
    import spark.implicits._
    // two weight classes 1 vs 20 in one stratum; over many ids the
    // heavy class must dominate a k=40 draw from 100+100 candidates
    val d = (0 until 200).map(i =>
        (i.toLong, "k", if (i < 100) 1L else 20L))
      .toDF("id", "lang", "w")
    val picked = Sampling.worSample(d, "id", "lang", "w", 40)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ >= 100)
    assert(heavy > 30, s"heavy-weight class got only $heavy of 40 picks")
  }

}
