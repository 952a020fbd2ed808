package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer training (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", public paper)
  * re-expressed for a shuffle engine.
  *
  * The scale insight the reference trainers all use: merges depend only
  * on the WORD-frequency table, not the corpus. So the corpus is
  * touched exactly once ([[wordCounts]] — tokenize + one hash
  * aggregation); every training round then runs on the |vocabulary|-row
  * word table: adjacent-pair counts weighted by word frequency (one
  * explode + aggregation over the small table), the argmax pair becomes
  * the round's merge, and the word table is rewritten with an in-row
  * greedy left-to-right fold. 100 TB of text with a 1M-word vocabulary
  * trains on a 1M-row table after the single corpus pass.
  *
  * Determinism: the argmax tiebreak is (count DESC, left ASC, right
  * ASC), so retraining on the same corpus yields the same merge
  * sequence regardless of partitioning.
  *
  * Encoding at corpus scale is a JOIN, not a per-word merge replay: the
  * trained word table already holds each word's final segmentation, so
  * [[encodeTokens]] joins exploded corpus words against it
  * (out-of-vocabulary words fall back to character symbols). */
object BpeTrainer {

  /** (word, freq) — the single corpus pass: whitespace tokenization
    * (the repo-wide collapseWs convention), empty tokens dropped. */
  def wordCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(explode(split(TextFunctions.collapseWs(col(textCol)), " "))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Character symbols of a word (the untrained segmentation). */
  private def charSyms(word: org.apache.spark.sql.Column) =
    filter(split(word, ""), s => s =!= "")

  /** Adjacent symbol pairs of the current segmentation, weighted by word
    * frequency: (left, right, pair_count). */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("freq"),
        explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("left"),
            element_at(col("syms"), i + 1).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("freq")).as("pair_count"))

  /** Greedy left-to-right application of ONE merge to a symbol array —
    * the standard BPE rewrite ("aaaa" under (a,a) becomes [aa, aa]). */
  private def applyMerge(
      syms: org.apache.spark.sql.Column, left: String, right: String) = {
    val l = lit(left)
    val r = lit(right)
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
        .otherwise(concat(acc, array(x))))
  }

  /** Train `nMerges` merges. Returns (merges, vocabWords):
    *  - merges: (rank, left, right) — the ordered merge table;
    *  - vocabWords: (word, freq, syms) — every training word's final
    *    segmentation, the join-side encoder input.
    * The word table is localCheckpoint'd per round (|vocabulary| rows —
    * materialized, so the corpus pass runs exactly once and lineage
    * stays one round deep). Training stops early if no adjacent pair
    * remains. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): (DataFrame, DataFrame) = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val spark = docs.sparkSession
    var words = wordCounts(docs, idCol, textCol)
      .select(col("word"), col("freq"), charSyms(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((rank, l, r))
        words = words
          .select(col("word"), col("freq"),
            applyMerge(col("syms"), l, r).as("syms"))
          .localCheckpoint()
        rank += 1
      }
    }
    import spark.implicits._
    (merges.toSeq.toDF("rank", "left", "right"), words)
  }

  /** Token stream of a corpus under a trained vocabulary: words join
    * their stored segmentation; out-of-vocabulary words fall back to
    * character symbols. Output: (idCol, token) rows in no particular
    * order — aggregate downstream (counts, histograms, packing). */
  def encodeTokens(docs: DataFrame, idCol: String, textCol: String,
      vocabWords: DataFrame): DataFrame =
    docs
      .select(col(idCol),
        explode(split(TextFunctions.collapseWs(col(textCol)), " "))
          .as("word"))
      .filter(col("word") =!= "")
      .join(vocabWords.select(col("word"), col("syms")), Seq("word"), "left")
      .select(col(idCol),
        explode(coalesce(col("syms"), charSyms(col("word")))).as("token"))
}
