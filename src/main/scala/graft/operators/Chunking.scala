package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sliding-window document chunking — the context-window preparation
  * step for training and retrieval pipelines: each document's token
  * stream is cut into windows of `maxWords` words advancing by
  * `maxWords - overlapWords`, so consecutive chunks share
  * `overlapWords` words of context and no content is lost at window
  * boundaries. Complements [[Packing]] (which concatenates ACROSS
  * documents to fill a budget): here the unit stays the document and
  * windows may overlap.
  *
  * The chunk count is computed with integer arithmetic —
  * `(nWords - overlap + stride - 1) div stride` — never a double ceil,
  * so the window layout is bit-identical on every engine. All of it is
  * array expressions inside the scan projection; the fan-out is
  * `posexplode` of an in-row array, no shuffle anywhere. */
object Chunking {

  /** (idCol, chunk_no, chunk_text, n_chunk_words). A document shorter
    * than `maxWords` (including the empty document) yields exactly one
    * chunk. The last chunk may be short; every word appears in at least
    * one chunk. */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
      maxWords: Int, overlapWords: Int = 0): DataFrame = {
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    require(overlapWords >= 0 && overlapWords < maxWords,
      s"overlapWords must be in [0, maxWords), got $overlapWords")
    val stride = maxWords - overlapWords
    docs
      .withColumn("__toks", split(TextFunctions.collapseWs(col(textCol)), " "))
      .select(col(idCol), posexplode(expr(
        s"""transform(
           |  sequence(0, greatest(
           |    (size(__toks) - $overlapWords + ${stride - 1}) div $stride,
           |    1) - 1),
           |  i -> array_join(slice(__toks, i * $stride + 1, $maxWords), ' '))"""
          .stripMargin))
        .as(Seq("chunk_no", "chunk_text")))
      .withColumn("n_chunk_words",
        TextFunctions.tokenCountCollapsed(col("chunk_text")))
  }
}
