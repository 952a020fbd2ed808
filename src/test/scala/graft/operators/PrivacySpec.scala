package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // 3 classes: (BR,GOLD) x3, (BR,SILVER) x2, (AR,GOLD) x1; sensitive
  // diagnosis column homogeneous in the (BR,GOLD) class.
  private def people = Seq(
    ("BR", "GOLD", "flu"), ("BR", "GOLD", "flu"), ("BR", "GOLD", "flu"),
    ("BR", "SILVER", "flu"), ("BR", "SILVER", "cold"),
    ("AR", "GOLD", "cold")
  ).toDF("nation", "segment", "diagnosis")

  test("kAnonymity: one row per class with its population") {
    val k = Privacy.kAnonymity(people, Seq("nation", "segment"))
      .as[(String, String, Long)].collect().toSet
    assert(k === Set(("BR", "GOLD", 3L), ("BR", "SILVER", 2L),
      ("AR", "GOLD", 1L)))
  }

  test("riskReport: min_k, rows under the bar, exact-division pct") {
    val r = Privacy.riskReport(people, Seq("nation", "segment"), kMin = 3)
      .select("n_classes", "n_rows", "min_k", "rows_at_risk", "pct_at_risk")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r === ((3L, 6L, 1L, 3L, 50.0)))
  }

  test("lDiversity flags homogeneous classes regardless of k") {
    val l = Privacy.lDiversity(people, Seq("nation", "segment"),
      "diagnosis", lMin = 2)
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    // The k=3 class is the leaky one (l=1); the k=2 class is diverse.
    assert(l === Set(
      ("BR", "GOLD", 3L, 1L, false),
      ("BR", "SILVER", 2L, 2L, true),
      ("AR", "GOLD", 1L, 1L, false)))
  }

  test("dpCounts: noise is deterministic per (group, seed), bounded, and zero-mean-ish") {
    val df = (1 to 300).map(i => ("g" + (i % 3), i)).toDF("g", "v")
    val a = Privacy.dpCounts(df, "g", epsilon = 1.0, seed = 7L)
      .orderBy("g").as[(String, Long, Double)].collect()
    val b = Privacy.dpCounts(df, "g", epsilon = 1.0, seed = 7L)
      .orderBy("g").as[(String, Long, Double)].collect()
    assert(a.sameElements(b), "same seed must reproduce the same noise")
    assert(a.forall { case (_, n, _) => n == 100L })
    // Laplace(b=1) noise: |noise| beyond 15 has probability ~3e-7.
    assert(a.forall { case (_, n, noisy) => math.abs(noisy - n) < 15.0 })
    val c = Privacy.dpCounts(df, "g", epsilon = 1.0, seed = 8L)
      .orderBy("g").as[(String, Long, Double)].collect()
    assert(!a.map(_._3).sameElements(c.map(_._3)),
      "a different seed must draw different noise")
  }

  test("dpCounts epsilon scales the noise magnitude inversely") {
    val df = (1 to 100).map(i => ("g" + (i % 5), i)).toDF("g", "v")
    val tight = Privacy.dpCounts(df, "g", epsilon = 10.0, seed = 3L)
      .as[(String, Long, Double)].collect()
      .map { case (_, n, x) => math.abs(x - n) }
    val loose = Privacy.dpCounts(df, "g", epsilon = 0.1, seed = 3L)
      .as[(String, Long, Double)].collect()
      .map { case (_, n, x) => math.abs(x - n) }
    // Same uniforms, 100x the scale: every magnitude grows exactly 100x
    // up to the DECIMAL(28,6) rounding of each endpoint.
    tight.zip(loose).foreach { case (t, l) =>
      assert(math.abs(l - 100.0 * t) < 1e-3)
    }
  }

  test("pseudonymize: stable per secret, distinct across secrets, join-preserving") {
    val a = Seq((1L, "x"), (2L, "y"), (1L, "z")).toDF("k", "v")
    val b = Seq((1L, "p"), (3L, "q")).toDF("k", "w")
    val ta = Privacy.pseudonymize(a, "k", "s1")
    val tb = Privacy.pseudonymize(b, "k", "s1")
    // same value -> same token within and across tables
    assert(ta.select("k").distinct().count() === 2L)
    val joined = ta.join(tb, "k").select("v", "w").as[(String, String)]
      .collect().toSet
    assert(joined === Set(("x", "p"), ("z", "p"))) // k=1 matches, 2/3 don't
    // a different secret derives disjoint tokens
    val tc = Privacy.pseudonymize(a, "k", "s2")
    assert(ta.join(tc, "k").count() === 0L)
    // null identifiers stay null
    val tn = Privacy.pseudonymize(
      Seq[(java.lang.Long, String)]((null, "n")).toDF("k", "v"), "k", "s1")
    assert(tn.filter(col("k").isNull).count() === 1L)
  }

  test("suppressRare merges under-k classes and leaves the rest intact") {
    val df = Seq(
      ("BR", "GOLD"), ("BR", "GOLD"), ("BR", "GOLD"),
      ("AR", "GOLD"), ("CL", "SILVER")
    ).toDF("nation", "segment")
    val out = Privacy.suppressRare(df, Seq("nation", "segment"), kMin = 2)
      .as[(String, String)].collect().toSeq.sorted
    assert(out === Seq(
      ("BR", "GOLD"), ("BR", "GOLD"), ("BR", "GOLD"),
      ("OTHER", "OTHER"), ("OTHER", "OTHER")).sorted)
    // after suppression the OTHER class itself reaches k=2
    val k2 = Privacy.kAnonymity(
      Privacy.suppressRare(df, Seq("nation", "segment"), 2),
      Seq("nation", "segment"))
      .as[(String, String, Long)].collect()
      .find(r => r._1 == "OTHER").map(_._3)
    assert(k2.contains(2L))
  }

  test("suppressRare treats null quasi values as a class (null-safe join)") {
    val df = Seq(
      (Some("BR"), "A"), (Some("BR"), "A"), (None, "A"), (None, "A"),
      (Some("CL"), "B")
    ).toDF("nation", "segment")
    val out = Privacy.suppressRare(df, Seq("nation", "segment"), kMin = 2)
      .as[(Option[String], String)].collect()
    // the (null, A) class has k=2 -> kept as-is (nulls must match
    // themselves in the rare join, not leak through as unmatched)
    assert(out.count(r => r._1.isEmpty && r._2 == "A") === 2)
    assert(out.count(r => r._1.contains("OTHER")) === 1)
  }

  test("suppressRare rejects non-string quasi columns") {
    val df = Seq((1, "a")).toDF("num", "s")
    val ex = intercept[IllegalArgumentException] {
      Privacy.suppressRare(df, Seq("num"), 2)
    }
    assert(ex.getMessage.contains("string"))
  }

  test("laplace uniform edge: the 1e-12 floor keeps noise finite") {
    // Can't force md5 to hit u=0, but the floor bounds |noise| by
    // ln(1e-12)/eps ~ 27.6 for ANY key at eps=1.
    val df = (1 to 2000).map(i => ("k" + i, i)).toDF("g", "v")
    val worst = Privacy.dpCounts(df, "g", epsilon = 1.0, seed = 1L)
      .select(max(abs(col("n_noisy") - col("n_true"))))
      .as[Double].head()
    assert(worst <= 27.631021115928547, s"noise must be floored, got $worst")
    assert(!worst.isNaN && !worst.isInfinite)
  }

  test("t-closeness: hand-computed variational distance, absent values included") {
    // class A: values {x: 2, y: 2} -> p = (1/2, 1/2, 0)
    // class B: values {x: 1, z: 3} -> p = (1/4, 0, 3/4)
    // global:  {x: 3, y: 2, z: 3}, N = 8 -> q = (3/8, 2/8, 3/8)
    // t(A) = (|1/2-3/8| + |1/2-2/8| + |0-3/8|) / 2 = (1+2+3)/16 = 3/8
    // t(B) = (|1/4-3/8| + |0-2/8| + |3/4-3/8|) / 2 = (1+2+3)/16 = 3/8
    val rows = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("A", "y"),
      ("B", "x"), ("B", "z"), ("B", "z"), ("B", "z"))
    val got = Privacy.tCloseness(rows.toDF("cls", "s"), Seq("cls"), "s",
      400000L).collect().map(r => r.getString(0) -> r).toMap
    assert(got("A").getLong(1) === 4L && got("B").getLong(1) === 4L)
    assert(got("A").getLong(2) === 375000L) // 3/8 exactly
    assert(got("B").getLong(2) === 375000L)
    assert(got("A").getBoolean(3) && got("B").getBoolean(3))
    // a tighter bar flips the flag
    val tight = Privacy.tCloseness(rows.toDF("cls", "s"), Seq("cls"), "s",
      300000L).collect()
    assert(tight.forall(!_.getBoolean(3)))
  }

  test("t-closeness is 0 for classes matching the global distribution") {
    val rows = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
    val got = Privacy.tCloseness(rows.toDF("cls", "s"), Seq("cls"), "s", 0L)
      .collect()
    assert(got.forall(r => r.getLong(2) == 0L && r.getBoolean(3)))
  }

  test("dpSum: clipping bounds every contribution before the sum") {
    // values -50 (clips to 0), 30, 500 (clips to clip=100):
    // sum_clipped = 0 + 30 + 100 = 130 exactly.
    val df = Seq(("g", -50.0), ("g", 30.0), ("g", 500.0)).toDF("k", "v")
    val out = Privacy.dpSum(df, "k", "v", clip = 100.0, epsilon = 1.0,
        seed = 7L)
      .select("sum_clipped", "sum_noisy").collect().head
    assert(out.getDouble(0) == 130.0)
    // noise = clip * unit draw: same (group, seed) reproduces exactly
    val again = Privacy.dpSum(df, "k", "v", clip = 100.0, epsilon = 1.0,
        seed = 7L).select("sum_noisy").collect().head.getDouble(0)
    assert(out.getDouble(1) == again)
    // and the clip factor scales the same unit draw linearly: at
    // clip=1 the values clip to 0, 1, 1 (sum 2), so the noise there
    // is 1/100th of the clip=100 noise (same key, same seed; both
    // rounded through DECIMAL(28,6), so compare at that grain)
    val small = Privacy.dpSum(df, "k", "v", clip = 1.0, epsilon = 1.0,
        seed = 7L).select("sum_noisy").collect().head.getDouble(0)
    assert(math.abs((out.getDouble(1) - 130.0) -
      100.0 * (small - 2.0)) < 1e-3, s"noise must scale with clip " +
      s"(got ${out.getDouble(1) - 130.0} vs ${100.0 * (small - 2.0)})")
  }
}
