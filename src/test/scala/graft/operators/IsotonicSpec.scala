package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(String, Long, Long, Long)]) =
    Isotonic.fit(rows.toDF("k", "pos", "ynum", "w"), "k", "pos", "ynum", "w")
      .select("k", "pos", "fitted")
      .as[(String, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))

  test("already-monotone data is returned unchanged") {
    val got = fit(Seq(("a", 0L, 1L, 1L), ("a", 1L, 2L, 1L), ("a", 2L, 5L, 1L)))
    assert(got.map(_._3).toSeq == Seq(1.0, 2.0, 5.0))
  }

  test("a single violation pools to the textbook block average") {
    // y = [1, 3, 2]: PAVA pools (3, 2) -> 2.5; fit = [1, 2.5, 2.5]
    val got = fit(Seq(("a", 0L, 1L, 1L), ("a", 1L, 3L, 1L), ("a", 2L, 2L, 1L)))
    assert(got.map(_._3).toSeq == Seq(1.0, 2.5, 2.5))
  }

  test("weights pull the pooled mean (hand-computed)") {
    // y = [3(w=1), 1(w=3)] violates: pooled mean = (3 + 3) / 4 = 1.5
    val got = fit(Seq(("a", 0L, 3L, 1L), ("a", 1L, 3L, 3L)))
    assert(got.map(_._3).toSeq == Seq(1.5, 1.5))
  }

  test("fully decreasing data collapses to the weighted global mean") {
    val got = fit(Seq(("a", 0L, 9L, 1L), ("a", 1L, 6L, 1L), ("a", 2L, 3L, 1L)))
    assert(got.map(_._3).toSeq == Seq(6.0, 6.0, 6.0))
  }

  test("keys fit independently and output is monotone per key") {
    val data = (0L until 12L).flatMap { p =>
      Seq(("up", p, p * (p % 3 + 1), 1L + p % 2),
        ("noisy", p, (p * 37 % 11), 1L + p % 3))
    }
    val got = fit(data)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val f = rows.sortBy(_._2).map(_._3)
      assert(f.zip(f.tail).forall { case (a, b) => a <= b },
        s"non-monotone fit: ${f.toSeq}")
    }
    // the fit preserves the weighted total (within nano quantization):
    // sum(w * fitted) == sum(ynum) is the PAVA block-mean property
    val byKey = data.groupBy(_._1)
    got.groupBy(_._1).foreach { case (k, rows) =>
      val wTot = rows.sortBy(_._2).map(_._3)
        .zip(byKey(k).sortBy(_._2).map(_._4))
        .map { case (f, w) => f * w }.sum
      val yTot = byKey(k).map(_._3).sum.toDouble
      assert(math.abs(wTot - yTot) < 1e-6,
        s"$k: weighted fit total $wTot != y total $yTot")
    }
  }
}
