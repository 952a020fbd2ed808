package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RandomProjection: projection determinism, the brute-force equivalence
  * law at candK >= |corpus| - 1, screen recall, and zero-vector
  * exclusion. */
class RandomProjectionSpec extends SparkSpec {

  private def vecsDf(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def randVecs(n: Int, dims: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (1L to n).map(i => (i, Seq.fill(dims)(rnd.nextGaussian().toFloat)))
  }

  test("project is deterministic and matches a hand-computed dot") {
    val dims = 4
    val v = Seq(1.0f, 2.0f, -1.0f, 0.5f)
    val df = vecsDf(Seq((1L, v)))
    val out = RandomProjection.project(df, "embedding", rDims = 3,
        seed = 7L, dims = dims)
      .select("rvec").collect().head.getSeq[Double](0)
    val planes = HyperplaneLSH.planes(3, dims, 7L)
    out.zip(planes).foreach { case (got, plane) =>
      // Same element rounding as DecimalDotExpr: float plane weights,
      // double products; the exact decimal sum is within 1 ulp-ish of
      // the plain double sum for 4 elements.
      val expected = v.zip(plane).map { case (x, w) =>
        x.toDouble * w.toFloat.toDouble }.sum
      assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
    }
    val again = RandomProjection.project(df, "embedding", 3, 7L, dims)
      .select("rvec").collect().head.getSeq[Double](0)
    assert(out == again)
  }

  test("law: candK >= |corpus| - 1 reproduces brute force exactly") {
    val corpus = vecsDf(randVecs(40, 16, seed = 3))
    val queries = corpus.filter(col("vec_id") <= 5)
    val brute = CosineSearch.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaProj = RandomProjection.topKViaProjection(corpus, queries,
        "vec_id", "embedding", k = 4, candK = 39, rDims = 6, seed = 11L,
        dims = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaProj == brute)
  }

  test("screen recall at modest candK is high on random data") {
    val corpus = vecsDf(randVecs(200, 16, seed = 9))
    val queries = corpus.filter(col("vec_id") <= 10)
    val k = 5
    val brute = CosineSearch.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val viaProj = RandomProjection.topKViaProjection(corpus, queries,
        "vec_id", "embedding", k, candK = 40, rDims = 8, seed = 11L,
        dims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect viaProj).size.toDouble / brute.size
    // Empirically ~0.9 for these parameters; 0.6 leaves margin while
    // still proving the screen ranks far better than chance (40/199).
    assert(recall >= 0.6, s"recall $recall")
  }

  test("zero vectors are excluded from the screen, not crashed on") {
    val corpus = vecsDf(randVecs(20, 8, seed = 5) :+
      (99L, Seq.fill(8)(0.0f)))
    val queries = corpus.filter(col("vec_id") <= 2)
    val out = RandomProjection.topKViaProjection(corpus, queries,
        "vec_id", "embedding", k = 3, candK = 10, rDims = 4, seed = 13L,
        dims = 8)
      .collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getLong(2) == 99L), "zero vector cannot rank")
  }
}
