package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64
  private def e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("training is deterministic and codes stay in bounds") {
    def cb() = ProductQuantizer.train(e, "vec_id", "embedding",
        dims, m = 8, ksub = 16, iters = 2, seed = 7L)
      .orderBy("subspace", "cid")
      .select("subspace", "cid", "centroid")
      .as[(Int, Int, Array[Float])].collect()
      .map { case (s, c, v) => (s, c, v.toSeq) }
    val a = cb()
    assert(a.toSeq == cb().toSeq, "re-training with the same seed diverged")
    assert(a.map(_._1).toSet == (0 until 8).toSet)
    assert(a.forall { case (_, c, v) => c >= 0 && c < 16 && v.length == 8 })

    val codebooks = ProductQuantizer.train(e, "vec_id", "embedding",
      dims, m = 8, ksub = 16, iters = 2, seed = 7L)
    val enc = ProductQuantizer.encode(e, "vec_id", "embedding",
      codebooks, dims, m = 8)
    assert(enc.count() == e.count())
    val bad = enc.filter(
      size(col("codes")) =!= 8 ||
        exists(col("codes"), c => c < 0 || c >= 16))
    assert(bad.count() == 0)
  }

  test("Lloyd rounds never increase the quantization objective") {
    def surrogate(iters: Int): Double = {
      val cb = ProductQuantizer.train(e, "vec_id", "embedding",
        dims, m = 8, ksub = 16, iters = iters, seed = 7L)
      ProductQuantizer.inertiaSurrogate(e, "vec_id", "embedding",
        cb, dims, m = 8)
    }
    val s0 = surrogate(0)
    val s1 = surrogate(1)
    val s3 = surrogate(3)
    info(f"quantization surrogate: init $s0%.5f, 1 round $s1%.5f, 3 rounds $s3%.5f")
    // float-repacked means can wiggle at ~1e-6; Lloyd still descends
    assert(s1 <= s0 + 1e-6 && s3 <= s1 + 1e-6,
      s"objective increased: $s0 -> $s1 -> $s3")
    assert(s3 < s0, "training never improved the objective")
  }

  test("ADC scores equal the sequential lookup model exactly") {
    val codebooks = ProductQuantizer.train(e, "vec_id", "embedding",
      dims, m = 8, ksub = 16, iters = 2, seed = 7L)
    val corpus = e.filter(col("vec_id") < 120)
    val queries = e.filter(col("vec_id") < 15)
    val encoded = ProductQuantizer.encode(corpus, "vec_id", "embedding",
      codebooks, dims, m = 8)

    // sequential model from collected artifacts, replicating float_dot's
    // in-order double accumulation and the s-ascending lookup sum
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val cb = codebooks.select("subspace", "cid", "centroid")
      .as[(Int, Int, Array[Float])].collect()
      .map { case (s, c, v) => (s, c) -> v }.toMap
    val codes = encoded.as[(Long, Array[Int])].collect().toMap
    val qvecs = queries.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val model = (for {
      (qid, qv) <- qvecs.toSeq
      (nid, cs) <- codes.toSeq if nid != qid
    } yield {
      val score = (0 until 8).foldLeft(0.0) { (acc, s) =>
        acc + fdot(qv.slice(s * 8, s * 8 + 8), cb((s, cs(s))))
      }
      (qid, nid) -> score
    }).toMap

    val got = ProductQuantizer.adcScores(encoded, codebooks, queries,
        "vec_id", "embedding", dims, m = 8)
      .as[(Long, Long, Double)].collect()
    assert(got.length == model.size)
    got.foreach { case (q, n, sc) =>
      assert(sc == model((q, n)), s"score mismatch for ($q, $n)")
    }
  }

  test("ADC top-k recall against the exact dot ranking clears the floor") {
    // ADC approximates the DOT product, so the honest baseline is the
    // exact dot-product top-k (bruteForceTopK ranks by cosine — a
    // different metric when corpus norms vary)
    val queries = e.filter(col("vec_id") < 25)
    val exactDot = {
      val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("nn_id"), col("embedding").as("cv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("dot").desc, col("nn_id"))
      q.crossJoin(c).filter(col("query_id") =!= col("nn_id"))
        .withColumn("dot",
          graft.functions.FloatDotExpr.float_dot(col("qv"), col("cv")))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
        .select("query_id", "nn_id")
    }
    def recall(m: Int, iters: Int): Double = {
      val codebooks = ProductQuantizer.train(e, "vec_id", "embedding",
        dims, m = m, ksub = 16, iters = iters, seed = 7L)
      val encoded = ProductQuantizer.encode(e, "vec_id", "embedding",
        codebooks, dims, m = m)
      CosineSearch.recallAtK(exactDot,
        ProductQuantizer.adcTopK(encoded, codebooks, queries,
          "vec_id", "embedding", dims, m = m, k = 10))
    }
    val r8 = recall(8, 3)
    val r32 = recall(32, 3)
    info(f"ADC recall@10 vs exact dot: m=8 $r8%.3f, m=32 $r32%.3f" +
      " (25 queries, 500 vectors; near-random embeddings are PQ's" +
      " worst case — measured grid: 8/16 .284, 8/64 .440, 16/16 .388," +
      " 16/64 .620, 32/16 .664)")
    // lossy by construction (8 vs 256 bytes); the floors guard a broken
    // LUT or codebook, and finer subspaces must help materially
    assert(r8 >= 0.2, s"m=8 recall@10 $r8 below floor")
    assert(r32 >= r8 + 0.2, s"m=32 ($r32) should clearly beat m=8 ($r8)")
    assert(r32 >= 0.55, s"m=32 recall@10 $r32 below floor")
  }

  test("IVF-PQ searches only the query's bucket, scored by ADC") {
    val coarse = e.filter(col("vec_id") < 8)
    val codebooks = ProductQuantizer.train(e, "vec_id", "embedding",
      dims, m = 32, ksub = 16, iters = 2, seed = 7L)
    val queries = e.filter(col("vec_id") < 20)
    val res = ProductQuantizer.ivfAdcTopK(e, coarse, codebooks, queries,
      "vec_id", "embedding", "vec_id", dims, m = 32, k = 5)
    // structural: every neighbor shares the query's coarse bucket
    val assigned = CosineSearch.ivfAssign(e, coarse,
        "vec_id", "embedding", "vec_id")
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    val rows = res.select("query_id", "nn_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, n) => assert(assigned(n) == assigned(q)) }
    // scoring: within a bucket, ranking equals plain ADC restricted to it
    val enc = ProductQuantizer.encode(e, "vec_id", "embedding",
      codebooks, dims, m = 32)
    val adcAll = ProductQuantizer.adcScores(enc, codebooks, queries,
        "vec_id", "embedding", dims, m = 32)
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, s) => (q, n) -> s }.toMap
    val got = res.select("query_id", "nn_id", "adc_score")
      .as[(Long, Long, Double)].collect()
    got.foreach { case (q, n, s) => assert(s == adcAll((q, n))) }
  }

  test("pqStepExact quantizes block means through the micro waypoint") {
    // hand-checked: canonical(0.15f) = 0.150000005960, canonical(0.2f)
    // = 0.200000002980 -> num12 = 350000008940, trunc(/2e6) = 175000
    // -> 0.175f; dim 2: 0.250000000000 + 0.400000005960 -> 325000 ->
    // 0.325f. The negative vector pins toward-zero truncation.
    val vecs = Seq(
      (1L, Array(0.15f, 0.25f)), (2L, Array(0.2f, 0.4f)))
      .toDF("vec_id", "embedding")
    val cb0 = Seq((0, 0, Array(0f, 0f))).toDF("subspace", "cid", "centroid")
    val out = ProductQuantizer.pqStepExact(vecs, "vec_id", "embedding",
        cb0, dims = 2, m = 1)
      .select("subspace", "cid", "centroid")
      .as[(Int, Int, Array[Float])].collect()
    assert(out.length == 1)
    assert(out.head._3.toSeq == Seq(0.175f, 0.325f))

    val neg = Seq((1L, Array(-0.15f, -0.25f)))
      .toDF("vec_id", "embedding")
    val outNeg = ProductQuantizer.pqStepExact(neg, "vec_id", "embedding",
        cb0, dims = 2, m = 1)
      .select("centroid").as[Array[Float]].collect()
    // canonical(-0.15f) = -0.150000005960 -> trunc = -150000 -> -0.15f
    assert(outNeg.head.toSeq == Seq(-0.15f, -0.25f))
  }

  test("trainExact is layout-independent and descends the objective") {
    def books(df: org.apache.spark.sql.DataFrame) =
      ProductQuantizer.trainExact(df, "vec_id", "embedding",
          dims, m = 8, ksub = 4, iters = 2, seed = 13L)
        .orderBy("subspace", "cid")
        .as[(Int, Int, Array[Float])].collect()
        .map { case (s, c, v) => (s, c, v.toSeq) }
    val a = books(e)
    val b = books(e.repartition(7))
    assert(a.toSeq == b.toSeq,
      "trainExact diverged under repartitioning — the micro waypoint leaked")

    def surrogate(iters: Int): Double = {
      val cb = ProductQuantizer.trainExact(e, "vec_id", "embedding",
        dims, m = 8, ksub = 4, iters = iters, seed = 13L)
      ProductQuantizer.inertiaSurrogate(e, "vec_id", "embedding",
        cb, dims, m = 8)
    }
    val s0 = surrogate(0)
    val s2 = surrogate(2)
    info(f"exact-train surrogate: init $s0%.5f, 2 rounds $s2%.5f")
    // micro quantization (1e-6 per element) cannot mask Lloyd descent
    assert(s2 < s0, s"exact training never improved the objective: $s0 -> $s2")
  }

  test("IVF-PQ re-rank degenerates to exact brute force at full width") {
    // nProbe = |centroids| and shortlist = |corpus| remove both
    // approximations, so the exact re-rank must reproduce
    // bruteForceTopK bit for bit — pins probe fan-out, ADC shortlist
    // plumbing, and the re-rank ordering in one equivalence.
    val coarse = e.filter(col("vec_id") < 8)
    val codebooks = ProductQuantizer.initCodebooks(e, "vec_id",
      "embedding", dims, m = 8, ksub = 4, seed = 13L)
    val queries = e.filter(col("vec_id") % 37 === 0)
    val n = e.count().toInt
    val full = ProductQuantizer.ivfPqRerankTopK(e, coarse, codebooks,
        queries, "vec_id", "embedding", "vec_id", dims, m = 8,
        nProbe = 8, shortlist = n, k = 5)
      .select("query_id", "rank", "nn_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val exact = CosineSearch.bruteForceTopK(e, queries, "vec_id",
        "embedding", 5)
      .select("query_id", "rank", "nn_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(full.nonEmpty)
    assert(full.toSeq == exact.toSeq)

    // production width (nProbe=2, shortlist=32) stays a valid top-k:
    // k rows per query, ranks 1..k, descending exact cosine
    val prod = ProductQuantizer.ivfPqRerankTopK(e, coarse, codebooks,
        queries, "vec_id", "embedding", "vec_id", dims, m = 8,
        nProbe = 2, shortlist = 32, k = 5)
      .select("query_id", "rank", "nn_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect()
    val byQ = prod.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length).toSeq)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.reverse.toSeq)
    }
  }
}
