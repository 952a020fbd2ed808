package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm) as a native codegen'd expression: one pass over the
  * text computes all k-gram polynomial hashes (rolling update, same
  * Base/Mod as [[RollingHashExpr]]) and selects, for every window of `w`
  * consecutive k-grams, the RIGHTMOST minimal hash, via a monotone deque —
  * O(n) total, no substring materialization, no shuffle.
  *
  * The selected (pos, fp) set is the document's winnowing signature. Its
  * guarantee: any substring match of length >= w + k - 1 between two
  * documents shares at least one fingerprint — which is what makes the
  * signature a sound screen for PARTIAL overlap (quotes, containment),
  * the case whole-doc families (minhash/simhash) are blind to.
  *
  * Per-doc local computation is the 100 TB design: the only shuffle in the
  * containment pipeline (graft.dedup.Winnow) is the equi-join on fp, and
  * signatures are ~2/(w+1) the k-gram count of the corpus.
  *
  * Edge rule: fewer than w k-grams (but at least one) = a single window
  * over all of them; text shorter than k = empty signature. Hash parity
  * caveat shared with rolling_hash: bytes are hashed, the DuckDB oracle
  * folds codepoints — identical on the ASCII corpus.
  */
object WinnowExpr {

  /** Column entry point: array<struct<pos:int, fp:bigint>>, 0-based pos. */
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    GraftShim.columnOf(WinnowFingerprints(GraftShim.expressionOf(text), k, w))

  val ElementType: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false)))

  /** Static helper referenced by both interpreted eval and codegen. */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])

    val B = RollingHashExpr.Base
    val M = RollingHashExpr.Mod
    // B^(k-1) mod M for the rolling drop-term.
    var bk1 = 1L
    var e = 0
    while (e < k - 1) { bk1 = bk1 * B % M; e += 1 }

    val hashes = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xFF)) % M; i += 1 }
    hashes(0) = h
    var p = 1
    while (p < nGrams) {
      // drop bytes(p-1), add bytes(p+k-1); keep everything in [0, M)
      h = ((h - (bytes(p - 1) & 0xFF) * bk1 % M) + M) % M
      h = (h * B + (bytes(p + k - 1) & 0xFF)) % M
      hashes(p) = h
      p += 1
    }

    val wEff = math.min(w, nGrams)
    // Monotone deque of k-gram indices; hashes strictly increase front to
    // back. Popping `>=` on push makes the surviving front the RIGHTMOST
    // occurrence of the window minimum (the paper's tie rule).
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val outPos = new Array[Int](nGrams)
    val outFp = new Array[Long](nGrams)
    var nOut = 0
    var iG = 0
    while (iG < nGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(iG)) tail -= 1
      deque(tail) = iG
      tail += 1
      val start = iG - wEff + 1
      if (start >= 0) {
        while (deque(head) < start) head += 1
        val sel = deque(head)
        // A given pos is selected by runs of adjacent windows; record once.
        if (nOut == 0 || outPos(nOut - 1) != sel) {
          outPos(nOut) = sel
          outFp(nOut) = hashes(sel)
          nOut += 1
        }
      }
      iG += 1
    }
    val rows = new Array[Any](nOut)
    var r = 0
    while (r < nOut) {
      rows(r) = new GenericInternalRow(Array[Any](outPos(r), outFp(r)))
      r += 1
    }
    new GenericArrayData(rows)
  }
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(WinnowExpr.ElementType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || w < 1)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints needs k >= 1 and w >= 1, got k=$k w=$w")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WinnowExpr.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowExpr.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
