package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer training (Kudo 2018, the
  * SentencePiece unigram algorithm) — the OTHER mainstream subword
  * family next to [[BpeTrainer]]: instead of greedy pair merges, hold a
  * piece vocabulary with probabilities and segment every word by
  * maximum-likelihood (Viterbi) decomposition; train by alternating
  * expectation rounds with vocabulary pruning until the target size.
  *
  * Deviation from the paper, documented: the E-step is VITERBI (hard)
  * EM — each word's best segmentation contributes its pieces, rather
  * than the forward-backward expected counts over all segmentations.
  * Hard EM is the standard cheap variant, keeps every step
  * deterministic (no float-sum ordering across lattice paths), and
  * converges to the same dominant pieces on natural corpora.
  *
  * Distribution shape (same contract as [[BpeTrainer]]): all training
  * work happens on the DISTINCT-WORD table — one corpus pass aggregates
  * `(word, freq)`, after which every E-step is a map over that bounded
  * table with the vocabulary broadcast (the vocabulary is
  * driver-bounded by construction: `maxSeed` rows at its largest).
  * Per-word Viterbi is a data-dependent DP no relational expression
  * expresses at realistic piece lengths — the adjudicated
  * `mapPartitions`-over-distinct-words seam ([[BpeTrainer.segmentWords]]).
  * Corpus-scale encoding is a JOIN through the segmented distinct-word
  * table, never per-row decoding.
  *
  * Reference analogue: none — fastETL has no tokenizer layer; this is
  * part of the training-data pipeline surface (token counting,
  * vocabulary induction) a 100 TB text corpus needs.
  */
object UnigramLm {

  /** Log-probability floor for characters absent from the vocabulary —
    * keeps segmentation total (any word decomposes into single chars). */
  private val UnkLogProb = -100.0

  /** Seed vocabulary: every substring of length 2..`maxPieceLen` of the
    * corpus's words, weighted by word frequency; the `maxSeed` heaviest
    * survive. Single characters are NOT seeded here — they are added
    * (and never pruned) by [[train]], guaranteeing closure. Pure
    * relational enumeration: explode start × end over the distinct-word
    * table, one token-keyed aggregation. */
  def seedVocab(wordCounts: DataFrame, maxPieceLen: Int,
      maxSeed: Int): DataFrame = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(maxSeed >= 1, s"maxSeed must be >= 1, got $maxSeed")
    wordCounts
      .select(col("word"), col("freq"), length(col("word")).as("len"))
      .filter(col("len") >= 2)
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), col("len") - 1)).as("start"), col("len"))
      .select(col("word"), col("freq"), col("start"),
        explode(sequence(lit(2),
          least(lit(maxPieceLen), col("len") - col("start") + 1)))
          .as("plen"))
      .select(substring(col("word"), col("start"), col("plen")).as("piece"),
        col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("seed_count"))
      .orderBy(col("seed_count").desc, col("piece"))
      .limit(maxSeed)
  }

  /** Viterbi-best segmentation of one word under piece log-probs:
    * maximize the sum of piece log-probabilities; unknown single
    * characters score [[UnkLogProb]] (unknown longer substrings are not
    * pieces). Deterministic tie-break: candidates for each prefix are
    * evaluated longest-last-piece first and only a STRICTLY better
    * score displaces, so at equal score the longer last piece wins. */
  private[operators] def viterbiOne(word: String, lp: Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen) // ascending j = longest piece first
      while (j < i) {
        val piece = word.substring(j, i)
        val plp = lp.get(piece) match {
          case Some(p) => p
          case None => if (i - j == 1) UnkLogProb else Double.NegativeInfinity
        }
        if (plp > Double.NegativeInfinity &&
            score(j) > Double.NegativeInfinity) {
          val s = score(j) + plp
          if (s > score(i)) { score(i) = s; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var p = n
    while (p > 0) { out = word.substring(back(p), p) :: out; p = back(p) }
    out
  }

  /** Viterbi segmentations for a distinct word set: `(word, pieces)`.
    * `vocab` is `(piece, logprob)`, broadcast (driver-bounded). */
  def segmentWords(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val lp = vocab.select(col("piece"), col("logprob"))
      .as[(String, Double)].collect().toMap
    val bc = spark.sparkContext.broadcast(lp)
    words.select(col("word")).as[String]
      .mapPartitions(it =>
        it.map(w => (w, viterbiOne(w, bc.value, maxPieceLen))))
      .toDF("word", "pieces")
  }

  /** Train a unigram vocabulary of (at most) `vocabSize` pieces:
    * seed with the heaviest substrings, then alternate `emRounds` of
    * Viterbi re-estimation with pruning the lightest `pruneFraction`
    * of multi-character pieces until the target size. Single characters
    * present in the corpus are always kept (closure). Returns
    * `(piece, logprob, piece_count)` — logprob from the final
    * re-estimation, count the Viterbi occurrence total. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, maxSeed: Int = 4096, emRounds: Int = 2,
      pruneFraction: Double = 0.25): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(pruneFraction > 0 && pruneFraction < 1,
      s"pruneFraction must be in (0,1), got $pruneFraction")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = BpeTrainer.wordCounts(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // required chars: every single character of the corpus (closure set)
    val chars = words
      .select(explode(filter(split(col("word"), ""), c => c =!= ""))
        .as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("c"))
      .as[(String, Long)].collect().toMap
    // seed multi-char pieces + chars, probs from raw counts
    var counts: Map[String, Double] =
      seedVocab(words, maxPieceLen, maxSeed)
        .as[(String, Long)].collect().toMap
        .map { case (p, c) => p -> c.toDouble } ++
        chars.map { case (p, c) => p -> c.toDouble }

    def logprobs(cs: Map[String, Double]): Map[String, Double] = {
      val total = cs.values.sum
      cs.map { case (p, c) => p -> math.log(c / total) }
    }

    def estep(lp: Map[String, Double]): Map[String, Double] = {
      val bc = spark.sparkContext.broadcast(lp)
      words.as[(String, Long)]
        .flatMap { case (w, f) =>
          viterbiOne(w, bc.value, maxPieceLen).map(p => (p, f)) }
        .toDF("piece", "f")
        .groupBy(col("piece")).agg(sum(col("f")).as("c"))
        .as[(String, Long)].collect()
        .map { case (p, c) => p -> c.toDouble }.toMap
    }

    var guard = 0
    while (counts.size > vocabSize && guard < 64) {
      guard += 1
      (1 to emRounds).foreach { _ =>
        val used = estep(logprobs(counts))
        // unused pieces die immediately (count 0 -> pruned below);
        // chars keep a floor so closure survives any corpus
        counts = counts.map { case (p, _) =>
          p -> used.getOrElse(p, if (p.length == 1) 1e-9 else 0.0) }
      }
      val multi = counts.filter { case (p, c) => p.length > 1 }
      // drop the lightest pruneFraction of multi-char pieces, but never
      // overshoot below vocabSize, and always make progress
      val excess = counts.size - vocabSize
      val nDrop = math.min(multi.size, math.max(1,
        math.min(math.ceil(multi.size * pruneFraction).toInt, excess)))
      val dropped = multi.toSeq
        .sortBy { case (p, c) => (c, p) } // lightest first, name-stable
        .take(nDrop).map(_._1).toSet
      counts = counts.filter { case (p, _) => !dropped.contains(p) }
      if (multi.isEmpty) guard = 64 // only chars left: cannot shrink more
    }
    val finalCounts = estep(logprobs(counts))
    val lp = logprobs(counts)
    words.unpersist()
    counts.keySet.toSeq.sorted
      .map(p => (p, lp(p), finalCounts.getOrElse(p, 0.0).toLong))
      .toDF("piece", "logprob", "piece_count")
  }

  /** Corpus token stream under a trained vocabulary: the DISTINCT word
    * set segments once ([[segmentWords]]), the corpus joins through.
    * Output `(idCol, token)` rows — aggregate downstream. */
  def encodeTokens(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int = 6): DataFrame = {
    val words = docs
      .select(col(idCol),
        explode(split(graft.functions.TextFunctions.collapseWs(col(textCol)),
          " ")).as("word"))
      .filter(col("word") =!= "")
    val segs = segmentWords(words.select(col("word")).distinct(),
      vocab, maxPieceLen)
    words.join(segs, Seq("word"))
      .select(col(idCol), explode(col("pieces")).as("token"))
  }
}
