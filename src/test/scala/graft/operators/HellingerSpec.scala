package graft.operators

import graft.SparkSpec

class HellingerSpec extends SparkSpec {
  import spark.implicits._

  private def bins(rows: (Long, Int)*) =
    rows.flatMap { case (b, n) => Seq.fill(n)(Tuple1(b)) }.toDF("bin")

  test("identical distributions give distance ~0") {
    val a = bins((1L, 10), (2L, 20), (3L, 10))
    val r = Divergence.hellinger(a, a, "bin")
      .select("hellinger").as[Double].head()
    assert(r < 1e-6, s"identical → ~0, got $r")
  }

  test("disjoint supports approach the maximum distance 1") {
    val a = bins((1L, 50), (2L, 50))
    val b = bins((9L, 50), (10L, 50))
    val r = Divergence.hellinger(a, b, "bin")
      .select("hellinger").as[Double].head()
    // add-one smoothing leaks some mass into the off-support bins, so
    // the supremum 1.0 is approached, not reached, at these counts
    assert(r > 0.8, s"disjoint → near 1, got $r")
  }

  test("hellinger over merged binCount state equals the batch readout") {
    // the same mergeable state family PSI rides: fold two halves,
    // merge, and the readout must be bit-identical to one-shot
    val full = bins((1L, 12), (2L, 30), (3L, 8))
    val h1 = bins((1L, 5), (2L, 14), (3L, 8))
    val h2 = bins((1L, 7), (2L, 16))
    val expected = bins((1L, 20), (2L, 20), (3L, 20))
    val merged = Divergence.mergeBinCounts(
      Divergence.binCounts(h1, "bin")
        .union(Divergence.binCounts(h2, "bin")))
    val fromState = Divergence.hellingerFromCounts(merged,
      Divergence.binCounts(expected, "bin"))
      .select("hellinger").as[Double].head()
    val oneShot = Divergence.hellinger(full, expected, "bin")
      .select("hellinger").as[Double].head()
    assert(fromState === oneShot)
  }

  test("symmetry: H(a,b) == H(b,a)") {
    val a = bins((1L, 30), (2L, 10))
    val b = bins((1L, 10), (2L, 30))
    val ab = Divergence.hellinger(a, b, "bin")
      .select("hellinger").as[Double].head()
    val ba = Divergence.hellinger(b, a, "bin")
      .select("hellinger").as[Double].head()
    assert(math.abs(ab - ba) < 1e-12)
    assert(ab > 0.05) // genuinely different distributions
  }
}
