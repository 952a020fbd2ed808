package graft.operators

import graft.SparkSpec

class AucSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force pair-counting AUC in ppm (floor), the definition the
    * midrank algebra must reproduce: (#(s⁺>s⁻) + ½#(s⁺=s⁻)) / n⁺n⁻. */
  private def brutePpm(rows: Seq[(Double, Long)]): Long = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val twice = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    twice * 1000000L / (2L * pos.size * neg.size)
  }

  test("midrank AUC equals brute-force pair counting, including ties") {
    val rows = Seq[(Double, Long)](
      (1.0, 0L), (2.0, 0L), (2.0, 1L), (3.0, 1L), (3.0, 0L), (3.0, 1L),
      (4.0, 1L), (4.0, 0L), (5.0, 1L), (0.5, 0L), (2.0, 0L))
    val df = rows.map { case (s, l) => ("g", s, l) }.toDF("k", "s", "l")
    val got = Auc.aucByKey(df, "k", "s", "l").collect()(0)
    assert(got.getLong(1) === rows.count(_._2 == 1L).toLong)
    assert(got.getLong(2) === rows.count(_._2 == 0L).toLong)
    assert(got.getLong(3) === brutePpm(rows))
  }

  test("perfect and inverted rankers hit the integer endpoints") {
    val perfect = Seq[(Double, Long)]((1.0, 0L), (2.0, 0L), (3.0, 1L),
      (4.0, 1L)).map { case (s, l) => ("g", s, l) }.toDF("k", "s", "l")
    assert(Auc.aucByKey(perfect, "k", "s", "l")
      .collect()(0).getLong(3) === 1000000L)
    val inverted = Seq[(Double, Long)]((1.0, 1L), (2.0, 1L), (3.0, 0L),
      (4.0, 0L)).map { case (s, l) => ("g", s, l) }.toDF("k", "s", "l")
    assert(Auc.aucByKey(inverted, "k", "s", "l")
      .collect()(0).getLong(3) === 0L)
  }

  test("all-tied scores give exactly 500000 ppm") {
    val df = Seq(("g", 7.0, 1L), ("g", 7.0, 0L), ("g", 7.0, 1L),
      ("g", 7.0, 0L)).toDF("k", "s", "l")
    assert(Auc.aucByKey(df, "k", "s", "l")
      .collect()(0).getLong(3) === 500000L)
  }

  test("single-class keys yield null AUC, not 0.5") {
    val df = Seq(("pos", 1.0, 1L), ("pos", 2.0, 1L),
      ("mix", 1.0, 0L), ("mix", 2.0, 1L)).toDF("k", "s", "l")
    val got = Auc.aucByKey(df, "k", "s", "l").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("pos").isNullAt(3))
    assert(got("mix").getLong(3) === 1000000L)
  }

  test("per-key isolation on a randomized corpus vs brute force") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      val k = s"k${i % 3}"
      val s = (rnd.nextInt(12) + 1).toDouble // heavy ties
      val l = if (rnd.nextDouble() < 0.3 + s / 40.0) 1L else 0L
      (k, s, l)
    }
    val got = Auc.aucByKey(rows.toDF("k", "s", "l"), "k", "s", "l")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    for (k <- Seq("k0", "k1", "k2")) {
      val sub = rows.filter(_._1 == k).map(r => (r._2, r._3))
      assert(got(k) === brutePpm(sub), s"key $k")
    }
  }
}
