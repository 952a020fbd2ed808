package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceWeightsSpec extends SparkSpec {
  import spark.implicits._

  /** Same bucketing the operator applies: md5-prefix of the feature. */
  private def bucket(feat: String, hexDigits: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(feat.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.substring(0, hexDigits)
  }

  test("bucketCounts counts unigrams plus adjacent bigrams") {
    // "aa bb" -> features aa, bb, "aa bb"; "cc" -> feature cc
    val docs = Seq("aa bb", "cc").toDF("text")
    val r = ImportanceWeights.bucketCounts(docs, "text", 8)
      .as[(String, Long)].collect().toMap
    val expected = Map(
      bucket("aa", 8) -> 1L, bucket("bb", 8) -> 1L,
      bucket("aa bb", 8) -> 1L, bucket("cc", 8) -> 1L)
    assert(r == expected)
  }

  test("logRatios matches the smoothed formula, full outer on buckets") {
    val target = Seq("aa bb").toDF("text") // aa:1, bb:1, "aa bb":1 — T=3
    val raw = Seq("cc").toDF("text")       // cc:1 — R=1
    val tc = ImportanceWeights.bucketCounts(target, "text", 8)
    val rc = ImportanceWeights.bucketCounts(raw, "text", 8)
    val r = ImportanceWeights.logRatios(tc, rc, 8, alpha = 1.0)
      .select(col("bucket"), col("llr").cast("double"))
      .as[(String, Double)].collect().toMap
    val b = math.pow(16.0, 8)
    def llr(t: Long, r0: Long): Double =
      math.log((t + 1.0) / (3.0 + b)) - math.log((r0 + 1.0) / (1.0 + b))
    val expected = Map(
      bucket("aa", 8) -> llr(1, 0), bucket("bb", 8) -> llr(1, 0),
      bucket("aa bb", 8) -> llr(1, 0),
      bucket("cc", 8) -> llr(0, 1)) // raw-only bucket survives the join
    assert(r.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(math.abs(r(k) - v) < 1e-9, k) }
  }

  test("score sums nb * llr with known-bucket accounting") {
    val docs = Seq((1L, "aa bb"), (2L, "aa aa")).toDF("doc_id", "text")
    // ratios know aa, bb, "aa aa" — but NOT the bigram "aa bb"
    val ratios = Seq(
      (bucket("aa", 8), BigDecimal("0.5")),
      (bucket("bb", 8), BigDecimal("-0.25")),
      (bucket("aa aa", 8), BigDecimal("1.0"))
    ).toDF("bucket", "llr")
      .select(col("bucket"), col("llr").cast("decimal(20,12)").as("llr"))
    val r = ImportanceWeights.score(docs, "doc_id", "text", ratios, 8)
      .select(col("doc_id"), col("n_feats"), col("n_scored"),
        col("score").cast("double"))
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4)).toMap
    // doc 1: aa, bb scored; bigram "aa bb" unknown -> only partial sum
    assert(r(1L)._1 == 3L && r(1L)._2 == 2L)
    assert(math.abs(r(1L)._3 - 0.25) < 1e-12)
    // doc 2: aa twice + bigram "aa aa" -> 2*0.5 + 1.0
    assert(r(2L)._1 == 3L && r(2L)._2 == 3L)
    assert(math.abs(r(2L)._3 - 2.0) < 1e-12)
  }

  test("NULL-text documents are unscorable and absent") {
    val docs = Seq((1L, "aa"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val ratios = Seq((bucket("aa", 8), BigDecimal("0.5")))
      .toDF("bucket", "llr")
      .select(col("bucket"), col("llr").cast("decimal(20,12)").as("llr"))
    val r = ImportanceWeights.score(docs, "doc_id", "text", ratios, 8)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(r == Set(1L))
  }

  test("end to end: target-like documents outscore raw-only ones") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "zz yy xx ww vv uu")
    ).toDF("doc_id", "text")
    val iw = ImportanceWeights
    val target = iw.bucketCounts(docs.filter(col("doc_id") <= 2), "text", 4)
    val raw = iw.bucketCounts(docs, "text", 4)
    val ratios = iw.logRatios(target, raw, 4)
    val r = iw.score(docs, "doc_id", "text", ratios, 4)
      .select(col("doc_id"), col("score").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(r(1L) > r(3L) && r(2L) > r(3L))
    // every feature of every doc came from the raw pool -> fully scored
    val full = iw.score(docs, "doc_id", "text", ratios, 4)
      .filter(col("n_scored") =!= col("n_feats")).count()
    assert(full == 0L)
  }

  test("scoreAgainstTarget equals the composed four-step pipeline") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the mat"),
      (3L, "pt", "o gato sentou no tapete"),
      (4L, "pt", "zz yy xx the cat")
    ).toDF("doc_id", "lang", "text")
    val iw = ImportanceWeights
    val composed = {
      val target = iw.bucketCounts(
        docs.filter(col("lang") === "en"), "text", 4)
      val raw = iw.bucketCounts(docs, "text", 4)
      val ratios = iw.logRatios(target, raw, 4)
      iw.score(docs, "doc_id", "text", ratios, 4)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_feats"),
          col("n_scored"), col("score"))
    }
    val fused = iw.scoreAgainstTarget(docs, "doc_id", "text",
        col("lang") === "en", 4, carry = Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_feats"),
        col("n_scored"), col("score"))
    assert(fused.schema == composed.schema)
    assert(fused.collect().toSet == composed.collect().toSet)
  }
}
