package graft.operators

import graft.SparkSpec

class CorpusLawsSpec extends SparkSpec {
  import spark.implicits._

  /** One doc per token burst: token ti repeated freq(i) times. */
  private def corpus(freqs: Int*) =
    freqs.zipWithIndex.map { case (f, i) =>
      (i.toLong, Seq.fill(f)(s"t$i").mkString(" "))
    }.toDF("doc_id", "text")

  test("an exact 1/rank corpus fits slope -1") {
    // freq_i = 120/i for i = 1..6: ln f = ln 120 - ln rank, exactly
    // linear with slope -1 (quantization residue ~1e-6 per point)
    val df = corpus(120, 60, 40, 30, 24, 20)
    val r = CorpusLaws.zipfFit(df, "text", 10)
      .select("vocab", "n_tokens", "v_used", "slope", "intercept")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 === 6L && r._2 === 294L && r._3 === 6L)
    assert(math.abs(r._4 - (-1.0)) < 1e-4)
    assert(math.abs(r._5 - math.log(120.0)) < 1e-4)
  }

  test("topV truncates the fit but not the corpus totals") {
    val df = corpus(120, 60, 40, 30, 24, 20)
    val r = CorpusLaws.zipfFit(df, "text", 3)
      .select("vocab", "v_used").as[(Long, Long)].head()
    assert(r._1 === 6L && r._2 === 3L)
  }

  test("rank ties break by token (total order): stable across runs") {
    val df = corpus(10, 10, 10, 5)
    val a = CorpusLaws.zipfFit(df, "text", 4)
      .select("slope").as[Double].head()
    val b = CorpusLaws.zipfFit(df.repartition(5), "text", 4)
      .select("slope").as[Double].head()
    assert(a === b)
  }

  test("fewer than 2 vocab entries yields null fit") {
    val df = corpus(7)
    val row = CorpusLaws.zipfFit(df, "text", 5)
      .select("slope", "intercept").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("a flat (uniform-frequency) corpus fits slope 0") {
    val df = corpus(9, 9, 9, 9, 9)
    val s = CorpusLaws.zipfFit(df, "text", 5)
      .select("slope").as[Double].head()
    assert(math.abs(s) < 1e-4)
  }
}
