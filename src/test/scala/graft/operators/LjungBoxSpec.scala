package graft.operators

import graft.SparkSpec

class LjungBoxSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[Double], maxLag: Int = 3) =
    AutoCorr.ljungBox(
        vals.zipWithIndex.map { case (v, t) => ("a", t.toLong, v) }
          .toDF("k", "t", "v"),
        "k", "t", "v", maxLag)
      .select("n", "q_stat")
      .as[(Long, Option[Double])].collect().head

  /** Independent reimplementation: classical mean-based ACF + the
    * textbook Q formula in plain doubles. */
  private def reference(vals: Seq[Double], maxLag: Int): Double = {
    val n = vals.length
    val mean = vals.sum / n
    val den = vals.map(v => (v - mean) * (v - mean)).sum
    val q = (1 to maxLag).map { k =>
      val num = (k until n).map(t => (vals(t) - mean) * (vals(t - k) - mean)).sum
      val rho = num / den
      rho * rho / (n - k)
    }.sum
    n * (n + 2.0) * q
  }

  test("matches the textbook formula on an autocorrelated series") {
    // strong lag-1 dependence: alternating high-low
    val vals = (0 until 24).map(t => if (t % 2 == 0) 10.0 else 2.0)
    val (n, q) = run(vals)
    assert(n == 24)
    val expect = reference(vals, 3)
    assert(q.exists(g => math.abs(g - expect) < 1e-8 * expect),
      s"got $q, expected ~$expect")
    // an alternating series is maximally non-white
    assert(q.exists(_ > 20.0))
  }

  test("white-ish noise scores far lower than structure") {
    val noise = (0 until 24).map(t => ((t * 7919) % 17).toDouble)
    val (_, qNoise) = run(noise)
    val (_, qAlt) = run((0 until 24).map(t => if (t % 2 == 0) 10.0 else 2.0))
    assert(qNoise.isDefined && qAlt.isDefined)
    assert(qAlt.get > 5.0 * qNoise.get,
      s"structure $qAlt should dwarf noise $qNoise")
  }

  test("degenerate inputs go null: constant series, n <= maxLag") {
    assert(run(Seq.fill(10)(7.0))._2.isEmpty, "constant series must be null")
    assert(run(Seq(1.0, 2.0, 3.0), maxLag = 3)._2.isEmpty,
      "n <= maxLag must be null")
  }

  test("bit-stable under repartitioning") {
    val rows = (0 until 40).flatMap(t => Seq(
      ("a", t.toLong, ((t * 31) % 11).toDouble),
      ("b", t.toLong, (t % 2 * 8).toDouble)))
    def go(parts: Int) = AutoCorr.ljungBox(
        rows.toDF("k", "t", "v").repartition(parts), "k", "t", "v", 3)
      .select("k", "q_stat").as[(String, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(go(2) == go(13))
  }
}
