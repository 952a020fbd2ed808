package graft.dedup

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{RollingHashExpr, WinnowExpr}

/** Shared naive winnowing reference (straight from the SIGMOD'03
  * definition: per-window rightmost min over from-scratch k-gram hashes,
  * no deque, no rolling update) — the independent implementation the
  * expression is pinned against. */
object WinnowTestRef {

  def naiveKgramHashes(s: String, k: Int): Array[Long] = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < k) return Array.empty
    (0 to bytes.length - k).map { i =>
      var h = 0L
      var j = i
      while (j < i + k) {
        h = (h * RollingHashExpr.Base + (bytes(j) & 0xFF)) % RollingHashExpr.Mod
        j += 1
      }
      h
    }.toArray
  }

  def naiveWinnow(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val hs = naiveKgramHashes(s, k)
    if (hs.isEmpty) return Seq.empty
    val we = math.min(w, hs.length)
    (0 to hs.length - we).map { st =>
      val win = hs.slice(st, st + we)
      val mn = win.min
      (st + win.lastIndexOf(mn), mn)
    }.distinct
  }

  def exprWinnow(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val arr = WinnowExpr.winnow(UTF8String.fromString(s), k, w)
    (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      (row.getInt(0), row.getLong(1))
    }
  }
}

/** Random-input laws for the winnowing expression. */
object WinnowProperties extends Properties("Winnow") {
  import WinnowTestRef._

  // Tiny alphabet maximizes repeated k-grams, so equal-hash ties (the
  // rightmost rule's hard case) occur constantly.
  private val genText = Gen.choose(0, 60).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))

  property("expression == naive reference (incl. ties, edges)") =
    forAll(genText, Gen.choose(1, 6), Gen.choose(1, 8)) {
      (s: String, k: Int, w: Int) =>
        exprWinnow(s, k, w) == naiveWinnow(s, k, w)
    }

  property("guarantee: shared substring >= w + k - 1 shares a fingerprint") = {
    val k = 4; val w = 5
    val genPad = Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val genShared = Gen.listOfN(w + k - 1, Gen.alphaLowerChar).map(_.mkString)
    forAll(genPad, genPad, genPad, genPad, genShared) {
      (p1: String, p2: String, p3: String, p4: String, shared: String) =>
        val fpsA = exprWinnow(p1 + shared + p2, k, w).map(_._2).toSet
        val fpsB = exprWinnow(p3 + shared + p4, k, w).map(_._2).toSet
        fpsA.intersect(fpsB).nonEmpty
    }
  }

  property("signature positions strictly increase, fps are window minima") =
    forAll(genText, Gen.choose(1, 6), Gen.choose(1, 8)) {
      (s: String, k: Int, w: Int) =>
        val sel = exprWinnow(s, k, w)
        val hs = naiveKgramHashes(s, k)
        sel.sliding(2).forall {
          case Seq((p1, _), (p2, _)) => p1 < p2
          case _ => true
        } && sel.forall { case (p, fp) => hs(p) == fp }
    }
}
