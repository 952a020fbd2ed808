package graft.operators

import graft.SparkSpec

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("a planted period-6 cosine spikes power at 6, not elsewhere") {
    // candidate periods all divide the 30-sample window, so the DC
    // component and off-frequency harmonics cancel exactly (a period
    // that does NOT divide the window leaks — standard spectral
    // leakage, not an operator defect)
    val rows = (0 until 30).map(t =>
      ("k", t.toLong, 100.0 + 50.0 * math.cos(2 * math.Pi * t / 6.0)))
    val out = Spectral.periodogram(rows.toDF("k", "t", "v"),
        "k", "t", "v", Seq(5, 6, 10, 15))
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    // amplitude 50 cosine: power at the true period ~ (50/2)^2 = 625
    assert(out(6) > 500.0)
    assert(out(5) < 50.0 && out(10) < 50.0 && out(15) < 50.0)
  }

  test("a constant series has (near-)zero power at every period") {
    val rows = (0 until 24).map(t => ("k", t.toLong, 10.0))
    val out = Spectral.periodogram(rows.toDF("k", "t", "v"),
        "k", "t", "v", Seq(2, 3, 4, 6))
      .collect().map(r => r.getDouble(3))
    // full periods of a constant cancel exactly up to the 1e-6
    // quantization of the trig factors
    assert(out.forall(_ < 1e-3))
  }

  test("gaps in t contribute nothing (no null poisoning)") {
    val rows = Seq(("k", 0L, 5.0), ("k", 2L, 5.0), ("k", 5L, 5.0))
    val out = Spectral.periodogram(rows.toDF("k", "t", "v"),
        "k", "t", "v", Seq(3))
      .select("n").as[Long].head()
    assert(out === 3L)
  }

  test("deterministic under repartitioning") {
    val rows = (0 until 60).map(t =>
      ("k", t.toLong, (t % 13) * 1.5))
    def run(d: org.apache.spark.sql.DataFrame) =
      Spectral.periodogram(d, "k", "t", "v", Seq(2, 5, 13))
        .collect().map(r => (r.getInt(1), r.getDouble(3)))
        .sortBy(_._1).toSeq
    val df = rows.toDF("k", "t", "v")
    assert(run(df) === run(df.repartition(7)))
  }
}
