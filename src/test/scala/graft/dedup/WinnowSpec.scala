package graft.dedup

import graft.SparkSpec
import graft.dedup.WinnowTestRef.{exprWinnow, naiveWinnow}

/** Pins graft.functions.WinnowExpr (deque algorithm, rolling hash, tie
  * rule, edge cases) against a naive from-scratch reference, plus
  * Winnow.containmentPairs semantics. Random-input laws live in
  * [[WinnowProperties]]. */
class WinnowSpec extends SparkSpec {

  test("expression matches the naive reference on repeated-pattern text (ties)") {
    // "abab..." repeats k-grams inside a window, forcing equal-hash ties;
    // the rightmost occurrence must win.
    for (s <- Seq("abababababab", "aaaaaaaaaa", "abcabcabcabc"))
      assert(exprWinnow(s, 2, 4) == naiveWinnow(s, 2, 4), s"text=$s")
  }

  test("edge rules: shorter than k is empty; fewer than w k-grams = one window") {
    assert(exprWinnow("abc", 4, 3).isEmpty)
    assert(exprWinnow("", 2, 3).isEmpty)
    // 5 chars, k=2 -> 4 k-grams < w=8: a single window over all four,
    // exactly one fingerprint selected.
    assert(exprWinnow("abcde", 2, 8).size == 1)
    assert(exprWinnow("abcde", 2, 8) == naiveWinnow("abcde", 2, 8))
  }

  // ------------------------------------------------- containment pairs
  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("containment: a quote of a small doc inside a large doc is asymmetric") {
    val quote = "the quick brown fox jumps over the lazy dog again and again"
    val filler = (1 to 40).map(i => s"unrelated filler sentence number $i with extra words").mkString(" ")
    val docs = docsDf(
      1L -> quote,
      2L -> (filler + " " + quote + " " + filler.reverse))
    val pairs = Winnow.containmentPairs(docs, "doc_id", "text",
        k = 8, w = 8, threshold = 0.5, maxDf = 100)
      .collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    val ca = r.getAs[Double]("containment_a")
    val cb = r.getAs[Double]("containment_b")
    assert(ca > 0.8, s"quote side should be nearly contained, got $ca")
    assert(cb < 0.5, s"big doc is mostly NOT the quote, got $cb")
  }

  test("containment: whole-doc near-dups score high both directions") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val docs = docsDf(1L -> base, 2L -> (base + " tail"))
    val pairs = Winnow.containmentPairs(docs, "doc_id", "text",
        k = 8, w = 8, threshold = 0.5, maxDf = 100).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Double]("containment_a") > 0.8)
    assert(pairs.head.getAs[Double]("containment_b") > 0.8)
  }

  test("maxDf screen drops corpus-frequent fingerprints (boilerplate immunity)") {
    // The same boilerplate in every doc; unique bodies otherwise. With
    // maxDf below the corpus size, boilerplate fps are screened and no
    // pair survives a 0.5 threshold.
    val boiler = "copyright two thousand twenty six all rights reserved worldwide"
    val docs = docsDf((1L to 8L).map(i =>
      i -> s"$boiler document body ${"x".*(i.toInt)} unique tail ${i * 7919}"): _*)
    val pairs = Winnow.containmentPairs(docs, "doc_id", "text",
        k = 8, w = 8, threshold = 0.5, maxDf = 4).collect()
    assert(pairs.isEmpty, s"boilerplate should be screened: ${pairs.mkString}")
    // Sanity: without the screen the boilerplate DOES link docs.
    val unscreened = Winnow.containmentPairs(docs, "doc_id", "text",
        k = 8, w = 8, threshold = 0.0, maxDf = 1000).collect()
    assert(unscreened.nonEmpty)
  }

  test("incremental ingest reproduces the full-corpus pair set exactly") {
    val quote = "the quick brown fox jumps over the lazy dog again and again"
    val mk = (i: Int) =>
      (1 to 12).map(j => s"batch$i filler sentence $j some words").mkString(" ")
    val b1 = Seq(1L -> (mk(1) + " " + quote), 2L -> mk(1))
    val b2 = Seq(3L -> (quote + " " + mk(2)), 4L -> (mk(2) + " more"))
    val b3 = Seq(5L -> quote, 6L -> mk(2)) // 6 near-dups batch-2's 4
    val all = b1 ++ b2 ++ b3
    val (k, w, th, maxDf) = (8, 8, 0.3, 1000L)

    val full = Winnow.containmentPairs(docsDf(all: _*), "doc_id", "text",
      k, w, th, maxDf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("n_shared"))).toSet

    def sets(rows: Seq[(Long, String)]) =
      Winnow.signatureSets(docsDf(rows: _*), "doc_id", "text", k, w)
    var state = sets(b1)
    // batch 1 bootstraps: internal pairs only (empty stored table)
    var pairs = Winnow.containmentPairsAgainst(
      state.limit(0), sets(b1), "doc_id", th, maxDf).collect().toSet
    for (b <- Seq(b2, b3)) {
      pairs = pairs ++ Winnow.containmentPairsAgainst(
        state, sets(b), "doc_id", th, maxDf).collect().toSet
      state = state.unionByName(sets(b))
    }
    val inc = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Long]("n_shared")))
    assert(inc == full, s"incremental $inc != full $full")
    assert(full.nonEmpty, "test corpus produced no containment pairs")
  }
}
