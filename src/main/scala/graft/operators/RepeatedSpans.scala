package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.TextFunctions

/** Maximal repeated-span detection — the relational analogue of
  * suffix-array exact-substring deduplication (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", public
  * paper): find the longest runs of text inside each document that occur
  * elsewhere in the corpus, so callers can excise the span (the paper's
  * treatment) rather than drop whole documents.
  *
  * A suffix array is a global sorted structure — wrong shape for a
  * shuffle engine. The relational restatement: overlapping positional
  * word n-gram shingles, corpus occurrence counts per shingle, then
  * gaps-and-islands over each document's duplicated positions — a run of
  * consecutive duplicated n-gram starts at positions [p, p+k] is exactly
  * a repeated substring of k+n words. Shuffles: one on the shingle hash,
  * one per-document window — both linear, nothing global.
  *
  * Matching the paper's semantics: a shingle counts as duplicated when
  * its total corpus occurrence count exceeds 1, so both cross-document
  * copies and within-document repetitions form spans.
  */
object RepeatedSpans {

  /** (id, pos, shingle) — overlapping word n-gram starts; documents
    * shorter than n words produce no rows. Pure array arithmetic. */
  def positionalShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs
      .withColumn("__ws", split(TextFunctions.collapseWs(col(textCol)), " "))
      .select(col(idCol),
        posexplode(TextFunctions.wordShingles("__ws", n))
          .as(Seq("pos", "shingle")))

  /** Maximal repeated spans of at least `minWords` words:
    * (id, span_start, span_words) with span_start a 0-based word offset.
    * Shingles travel as md5 fingerprints so the shuffled rows stay small
    * at any shingle width. */
  def spans(docs: DataFrame, idCol: String, textCol: String, n: Int,
      minWords: Int, scope: CacheScope = CacheScope.session): DataFrame = {
    require(minWords >= n, s"minWords ($minWords) must be >= n ($n)")
    val sh = scope.retain(
      positionalShingles(docs, idCol, textCol, n)
        .select(col(idCol), col("pos"), md5(col("shingle")).as("fp")))
    val counts = sh.groupBy(col("fp")).agg(count(lit(1)).as("occ"))
    val dup = sh.join(counts, Seq("fp"))
      .filter(col("occ") > 1)
      .select(col(idCol), col("pos"))
    // gaps-and-islands: consecutive duplicated shingle starts share
    // (pos - row_number), each island is one maximal repeated substring
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    dup
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (count(lit(1)) + lit(n - 1)).as("span_words"))
      .filter(col("span_words") >= minWords)
      .select(col(idCol), col("span_start"), col("span_words"))
  }

  /** Documents with the given spans excised — the paper's treatment:
    * every word whose 0-based position falls inside any (span_start,
    * span_words) range is dropped, the rest re-joined with single
    * spaces. Every input document survives (a fully-covered document
    * comes back as an empty string), mirroring
    * [[LineDedup.removeCommonLines]]'s keep-the-document contract.
    *
    * Scale shape: spans collapse to ONE array row per document, the join
    * back to the corpus is id-keyed on |docs| rows, and the word-level
    * work is array expressions inside each row — the |words| fan-out
    * never shuffles. */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String,
      spansDf: DataFrame): DataFrame = {
    val perDoc = spansDf.groupBy(col(idCol))
      .agg(collect_list(struct(
        col("span_start").cast("long").as("s"),
        col("span_words").cast("long").as("w"))).as("__spans"))
    docs
      .join(perDoc, Seq(idCol), "left")
      // a NULL text has no words to keep: coalesce to an empty token
      // array so the document still survives as ("", 0) — the same shape
      // the oracle's LEFT JOIN + coalesce produces
      .withColumn("__toks", coalesce(
        split(TextFunctions.collapseWs(col(textCol)), " "),
        expr("CAST(array() AS ARRAY<STRING>)")))
      .withColumn("__kept", expr(
        """filter(__toks, (t, i) ->
          |  __spans IS NULL OR NOT exists(__spans,
          |    sp -> i >= sp.s AND i < sp.s + sp.w))""".stripMargin))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("cleaned_text"),
        size(col("__kept")).cast("long").as("n_words_kept"))
  }

  /** Detection chained to excision in one call: the corpus projection is
    * retained so both the shingle derivation and the excision join read
    * one scan. */
  def exciseSpans(docs: DataFrame, idCol: String, textCol: String, n: Int,
      minWords: Int, scope: CacheScope = CacheScope.session): DataFrame = {
    val d = scope.retain(docs.select(col(idCol), col(textCol)))
    removeSpans(d, idCol, textCol, spans(d, idCol, textCol, n, minWords, scope))
  }
}
