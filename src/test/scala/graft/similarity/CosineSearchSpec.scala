package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CosineSearchSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f))   // opposite of 0
  ).toDF("vec_id", "embedding")

  test("brute-force topk ranks by cosine with deterministic tiebreak") {
    val res = CosineSearch.bruteForceTopK(
        vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding", 3)
      .orderBy("rank")
      .select("rank", "nn_id").as[(Int, Long)].collect().toSeq
    assert(res == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("native DecimalDot equals the expression-composed decimal fold on real embeddings") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val pairs = q.crossJoin(e.limit(50))
    val hof = org.apache.spark.sql.functions.aggregate(
      org.apache.spark.sql.functions.zip_with(col("qv"), col("embedding"),
        (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(20,12)")),
      lit(0).cast("decimal(30,12)"),
      (acc, v) => (acc + v).cast("decimal(30,12)"))
    val diffs = pairs.select(
        CosineSearch.dotDecimal(col("qv"), col("embedding")).as("native"),
        hof.as("hofv"))
      .filter(col("native") =!= col("hofv"))
    assert(diffs.count() == 0)
  }

  test("cosine of identical vectors is 1.0 within decimal accumulation") {
    val self = CosineSearch.withNormSq(vecs, "embedding")
      .withColumn("cos", CosineSearch.cosine(
        CosineSearch.dotDecimal(col("embedding"), col("embedding")),
        col("norm_sq"), col("norm_sq")))
      .select("cos").as[Double].collect()
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
  }

  test("ivf assignment puts every vector in exactly one bucket") {
    val assigned = CosineSearch.ivfAssign(
      vecs, vecs.filter(col("vec_id") < 2), "vec_id", "embedding", "vec_id")
    assert(assigned.count() == vecs.count())
    assert(assigned.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
    // vector 1 is nearest to centroid... itself (cos 1.0)
    val own = assigned.filter(col("vec_id") === 1L)
      .select("centroid_id").as[Long].collect().head
    assert(own == 1L)
  }

  test("IVF recall@10 on real embeddings; multi-probe recovers recall") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") < 20)
    val centroids = e.filter(col("vec_id") < 16)
    val exact = CosineSearch.bruteForceTopK(e, queries, "vec_id", "embedding", 10)
      .localCheckpoint()
    def recall(nProbe: Int): Double = CosineSearch.recallAtK(exact,
      CosineSearch.ivfTopK(e, centroids, queries,
        "vec_id", "embedding", "vec_id", k = 10, nProbe = nProbe))
    val r1 = recall(1)
    val r3 = recall(3)
    val r5 = recall(5)
    info(f"recall@10: 1-probe $r1%.3f, 3-probe $r3%.3f, 5-probe $r5%.3f" +
      " (16 buckets, 500 vectors)")
    assert(r1 >= 0.5, s"1-probe recall@10 $r1 below floor")
    assert(r3 >= r1 && r5 >= r3, "more probes must never lose recall")
    assert(r5 >= 0.8, s"5-probe recall@10 $r5 below floor")
  }

  test("nProbe=1 equals the original single-bucket search exactly") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val res = CosineSearch.ivfTopK(e, e.filter(col("vec_id") < 16),
      e.filter(col("vec_id") < 20), "vec_id", "embedding", "vec_id", 5)
    // every returned neighbor shares the query's own assignment bucket
    val assigned = CosineSearch.ivfAssign(e, e.filter(col("vec_id") < 16),
        "vec_id", "embedding", "vec_id")
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    res.select("query_id", "nn_id").as[(Long, Long)].collect()
      .foreach { case (q, n) => assert(assigned(n) == assigned(q)) }
  }

  test("multi-probe near-dup recovers boundary-straddling pairs, scored once") {
    // centroids at 0° and 45°; two near-identical vectors at 20° and 25°
    // fall on opposite sides of the 22.5° bucket boundary — invisible to
    // the 1-probe bucket self-join, recovered when each vector is
    // assigned to both of its nearest buckets
    def at(deg: Double) = Array(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val cents = Seq((0L, at(0)), (1L, at(45))).toDF("vec_id", "embedding")
    val vs = Seq((100L, at(20)), (101L, at(25)), (200L, at(90)))
      .toDF("vec_id", "embedding")
    def pairs(nProbe: Int) = CosineSearch.ivfNearDupPairs(
        vs, cents, "vec_id", "embedding", "vec_id",
        threshold = 0.99, nProbe = nProbe)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    assert(pairs(1) == Seq.empty, "1-probe must miss the straddling pair")
    // 2-probe: both vectors probe both buckets; the pair appears in both
    // candidate buckets but must be scored and returned exactly once
    assert(pairs(2) == Seq((100L, 101L)))
  }

  test("zero-norm centroid ranks last, as under the descending window") {
    // 0/0 double division is NULL in Spark (and DuckDB) — not NaN — so
    // the old window's c_sim DESC ordering put a zero-norm centroid last
    // (desc_nulls_last); the array argmin maps the null to +Infinity and
    // must agree: every vector goes to the real centroid
    val cents = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val assigned = CosineSearch.ivfAssign(
        vecs, cents, "vec_id", "embedding", "vec_id")
      .select("centroid_id").as[Long].collect()
    assert(assigned.length == 4 && assigned.forall(_ == 1L))
  }

  test("multi-probe assignment puts each vector in nAssign buckets") {
    val assigned = CosineSearch.ivfAssign(
      vecs, vecs.filter(col("vec_id") < 2), "vec_id", "embedding", "vec_id",
      nAssign = 2)
    assert(assigned.count() == vecs.count() * 2)
    assert(assigned.groupBy("vec_id").count()
      .filter(col("count") =!= 2).count() == 0)
  }

  test("LSH amplification: recall grows monotonically with tables") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(nTables: Int) = HyperplaneLSH.nearDupPairsAmplified(
        e, "vec_id", "embedding", nBits = 8, nTables = nTables,
        seed = 11L, threshold = 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val one = pairs(1)
    val four = pairs(4)
    // table 0 of the 4-table family IS the 1-table family (same seed):
    // the amplified pair set must be a superset, and with 8-bit buckets
    // (256 buckets over 500 vectors) extra tables recover real pairs
    assert(one.subsetOf(four))
    info(s"1 table: ${one.size} pairs; 4 tables: ${four.size} pairs")
    assert(four.size > one.size, "amplification recovered nothing")
    // single-table amplified equals the plain single-table operator
    val plain = HyperplaneLSH.nearDupPairs(
        e, "vec_id", "embedding", nBits = 8, seed = 11L, threshold = 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(one == plain)
  }

  test("incremental LSH equals the full-corpus pairs restricted to new docs") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = e.filter(col("vec_id") >= 100)
    val batch1 = e.filter(col("vec_id") < 50)
    val batch2 = e.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    // the persisted corpus bucket table, built once and reused across
    // ingest calls (localCheckpoint stands in for the parquet round-trip)
    val stored = HyperplaneLSH.bucketTable(
      corpus, "vec_id", "embedding", nBits = 8, seed = 11L).localCheckpoint()
    def norm(p: (Long, Long)) = if (p._1 < p._2) p else p.swap
    def full(batch: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      HyperplaneLSH.nearDupPairs(corpus.unionByName(batch),
          "vec_id", "embedding", nBits = 8, seed = 11L, threshold = 0.3)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    def inc(batch: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      HyperplaneLSH.nearDupPairsIncremental(batch, stored,
          "vec_id", "embedding", nBits = 8, seed = 11L, threshold = 0.3)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    // batch 1: exactly the full-corpus pairs touching a new id
    val expected1 = full(batch1)
      .filter(p => p._1 < 50 || p._2 < 50).map(norm)
    val got1 = inc(batch1)
    assert(expected1.nonEmpty)
    assert(got1.map(norm).toSet == expected1)
    assert(got1.length == got1.toSet.size, "pair emitted twice")
    // the SAME stored table serves the next batch unchanged
    val expected2 = full(batch2)
      .filter(p => p._1 >= 50 && p._1 < 100 || p._2 >= 50 && p._2 < 100)
      .map(norm)
    val got2 = inc(batch2)
    assert(expected2.nonEmpty)
    assert(got2.map(norm).toSet == expected2)
  }

  test("incremental IVF near-dup equals full-corpus pairs on new docs") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = e.filter(col("vec_id") < 16)
    val corpus = e.filter(col("vec_id") >= 100)
    val batch = e.filter(col("vec_id") < 100)
    // the persisted corpus assignment, built once with the same
    // centroids and reused across ingest calls
    val stored = CosineSearch.ivfAssign(
      corpus, cents, "vec_id", "embedding", "vec_id", nAssign = 2)
      .localCheckpoint()
    def norm(p: (Long, Long)) = if (p._1 < p._2) p else p.swap
    val full = CosineSearch.ivfNearDupPairs(e, cents,
        "vec_id", "embedding", "vec_id", threshold = 0.3, nProbe = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = full.filter(p => p._1 < 100 || p._2 < 100).map(norm)
    val got = CosineSearch.ivfNearDupPairsIncremental(batch, stored, cents,
        "vec_id", "embedding", "vec_id", threshold = 0.3, nProbe = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    assert(expected.nonEmpty)
    assert(got.map(norm).toSet == expected)
    assert(got.length == got.toSet.size, "pair emitted twice")
  }

  test("incremental amplified LSH equals full-corpus amplified pairs on new docs") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = e.filter(col("vec_id") >= 100)
    val batch = e.filter(col("vec_id") < 100)
    val stored = HyperplaneLSH.bucketTableAmplified(corpus,
      "vec_id", "embedding", nBits = 8, nTables = 4, seed = 11L)
      .localCheckpoint()
    def norm(p: (Long, Long)) = if (p._1 < p._2) p else p.swap
    val full = HyperplaneLSH.nearDupPairsAmplified(e,
        "vec_id", "embedding", nBits = 8, nTables = 4, seed = 11L,
        threshold = 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = full.filter(p => p._1 < 100 || p._2 < 100).map(norm)
    val got = HyperplaneLSH.nearDupPairsIncrementalAmplified(batch, stored,
        "vec_id", "embedding", nBits = 8, nTables = 4, seed = 11L,
        threshold = 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    assert(expected.nonEmpty)
    assert(got.map(norm).toSet == expected)
    assert(got.length == got.toSet.size, "pair emitted twice")
    // amplification contributes: strictly more than the 1-table family
    val oneTable = HyperplaneLSH.nearDupPairsIncremental(batch,
        HyperplaneLSH.bucketTable(corpus, "vec_id", "embedding", 8, 11L),
        "vec_id", "embedding", 8, 11L, 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(oneTable.map(norm).subsetOf(got.map(norm).toSet))
  }

  test("ivf topk only searches within the query's bucket") {
    val res = CosineSearch.ivfTopK(
      vecs, vecs.filter(col("vec_id") < 2), vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", "vec_id", 10)
    val neighbors = res.select("nn_id").as[Long].collect().toSet
    // bucket of centroid 0 holds {0, 3} (3 is opposite but still nearest
    // to 0 among the two centroids? no: cos(3,0)=-1 < cos(3,1)≈-0.99) —
    // assert the structural property instead: all results share the
    // query's bucket.
    val assigned = CosineSearch.ivfAssign(
      vecs, vecs.filter(col("vec_id") < 2), "vec_id", "embedding", "vec_id")
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    neighbors.foreach(n => assert(assigned(n) == assigned(0L)))
  }
}
