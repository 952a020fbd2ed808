package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document-quality filtering for training-data curation — the two
  * rule families every public web-corpus pipeline applies before dedup:
  *
  *  - Gopher-style document rules (Rae et al. 2021, "Scaling Language
  *    Models"): word-count bounds, mean-word-length bounds, symbol-to-word
  *    ratio, alphabetic-word fraction, minimum stopword hits. A document
  *    failing any rule is dropped whole.
  *  - C4-style line rules (Raffel et al. 2020, "Exploring the Limits of
  *    Transfer Learning"): per-line minimum word count, terminal
  *    punctuation, and a phrase blacklist; offending lines are removed and
  *    documents left with too few lines are dropped.
  *
  * Both are pure Column expressions over the scan projection — zero
  * shuffles for the Gopher path (per-document metrics only); the line
  * path shuffles once on the document key for re-assembly, exactly like
  * [[LineDedup.removeCommonLines]]. All arithmetic is the
  * replace-and-measure / array idiom from [[TextFunctions]], so the same
  * numbers fall out of any engine (the DuckDB oracle hash-matches the
  * metrics, not just the verdicts).
  *
  * Reference scope: fastETL has no quality filtering (its unit is the
  * relational row); these operators are part of the beyond-reference
  * LLM-pipeline layer, like `graft.dedup` and `graft.similarity`.
  */
object QualityFilter {

  /** Gopher rule thresholds. Defaults follow the published paper; the
    * oracle query narrows them to values that discriminate on the test
    * corpus. */
  final case class GopherThresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2) {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    require(maxWords >= minWords, "maxWords must be >= minWords")
    require(maxMeanWordLen >= minMeanWordLen,
      "maxMeanWordLen must be >= minMeanWordLen")
  }

  /** Symbols whose density marks machine-generated text: '#' and the
    * three-dot ellipsis (the paper's hash-and-ellipsis rule). */
  private val SymbolMarkers: Seq[String] = Seq("#", "...")

  /** Stopwords for the minimum-stopword rule — the same marker set the
    * quality score uses, shared so the two rules can't drift. */
  val StopMarkers: Seq[String] = TextFunctions.QualityStopMarkers

  /** The five Gopher metric expressions over a text column — pure Column
    * arithmetic shared by [[gopherStats]] (emits them) and
    * [[gopherFilter]] (folds them straight into a filter predicate, so
    * the verdict never needs a join back to the corpus). */
  private final case class Metrics(textCol: String) {
    private val s = TextFunctions.collapseWs(col(textCol))
    val nWords: Column = TextFunctions.tokenCount(col(textCol))
    // total word chars = collapsed length minus the (n-1) separators
    val meanWordLen: Column = when(nWords === 0, lit(0.0)).otherwise(
      (length(s) - (nWords - lit(1))).cast("double") / nWords.cast("double"))
    private val symbolHits = SymbolMarkers.map(m =>
      (length(s) - length(replace(s, lit(m), lit("")))) / lit(m.length))
      .reduce(_ + _)
    val symbolRatio: Column = when(nWords === 0, lit(0.0))
      .otherwise(symbolHits.cast("double") / nWords.cast("double"))
    // a word counts as alphabetic if it contains at least one letter
    private val alphaWords = size(filter(split(s, " "), w => w.rlike("[a-zA-Z]")))
    val alphaFrac: Column = when(nWords === 0, lit(0.0))
      .otherwise(alphaWords.cast("double") / nWords.cast("double"))
    val stopHits: Column =
      TextFunctions.langScore(lower(col(textCol)), StopMarkers)
    def keep(th: GopherThresholds): Column =
      nWords.between(th.minWords, th.maxWords) &&
        meanWordLen.between(th.minMeanWordLen, th.maxMeanWordLen) &&
        (symbolRatio <= th.maxSymbolRatio) &&
        (alphaFrac >= th.minAlphaFrac) &&
        (stopHits >= th.minStopHits)
  }

  /** Per-document Gopher metrics and verdict:
    * (idCol, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
    * keep). Metrics are emitted alongside the verdict so downstream
    * mixture/repair decisions can re-threshold without a second corpus
    * pass. Single map-side pass; no shuffle, no UDFs. */
  def gopherStats(docs: DataFrame, idCol: String, textCol: String,
      th: GopherThresholds = GopherThresholds()): DataFrame = {
    val m = Metrics(textCol)
    docs.select(col(idCol), m.nWords.as("n_words"),
      m.meanWordLen.as("mean_word_len"), m.symbolRatio.as("symbol_ratio"),
      m.alphaFrac.as("alpha_frac"), m.stopHits.as("stop_hits"),
      m.keep(th).as("keep"))
  }

  /** The surviving documents (original columns), Gopher rules applied —
    * the verdict is evaluated inline in the filter, so this stays a
    * single map-side scan (no join, no second pass). */
  def gopherFilter(docs: DataFrame, textCol: String,
      th: GopherThresholds = GopherThresholds()): DataFrame =
    docs.filter(Metrics(textCol).keep(th))

  /** C4 line-rule thresholds. `requireTerminalPunct` is off by default
    * because corpora without sentence punctuation (like the synthetic
    * test corpus) would be dropped whole; the spec covers it with
    * punctuated fixtures. */
  final case class LineRules(
      minWordsPerLine: Int = 3,
      requireTerminalPunct: Boolean = false,
      blacklist: Seq[String] = Seq("lorem ipsum", "javascript", "cookie"),
      minKeptLines: Int = 3) {
    require(minWordsPerLine >= 1,
      s"minWordsPerLine must be >= 1, got $minWordsPerLine")
    require(minKeptLines >= 1, s"minKeptLines must be >= 1, got $minKeptLines")
  }

  private val TerminalPunct = Seq(".", "!", "?", "\"")

  /** True when the line passes every C4 rule. Blacklist matching is
    * case-insensitive substring containment (the paper's rule); word
    * counting reuses the replace-and-measure idiom. */
  private def lineKeep(line: Column, rules: LineRules): Column = {
    val words = TextFunctions.tokenCountCollapsed(line)
    val punctOk =
      if (!rules.requireTerminalPunct) lit(true)
      else TerminalPunct.map(p => line.endsWith(p)).reduce(_ || _)
    val blackOk = rules.blacklist
      .map(b => !lower(line).contains(b.toLowerCase))
      .foldLeft(lit(true))(_ && _)
    (words >= rules.minWordsPerLine) && punctOk && blackOk
  }

  /** C4-style line filtering over the [[LineDedup.lines]] chunking:
    * offending lines removed, documents re-assembled in original line
    * order, documents left with fewer than `minKeptLines` lines dropped.
    * Output: (idCol, cleaned_text, n_lines_kept).
    *
    * One keyed shuffle (the per-document re-assembly aggregation);
    * line verdicts are evaluated map-side inside the same stage as the
    * chunking, so the corpus is scanned once. */
  def cleanLines(docs: DataFrame, idCol: String, textCol: String,
      wordsPerLine: Int, rules: LineRules = LineRules()): DataFrame =
    LineDedup.reassemble(
        LineDedup.lines(docs, idCol, textCol, wordsPerLine)
          .filter(lineKeep(col("line"), rules)),
        idCol)
      .filter(col("n_lines_kept") >= rules.minKeptLines)

  /** ln(2) as a shared literal — both engines divide by the same
    * constant instead of each evaluating ln(2) at runtime. */
  val Ln2 = 0.6931471805599453

  /** Per-document character-distribution Shannon entropy, in bits —
    * the information-theoretic twin of the deflate `compress_ratio`
    * signal (low entropy ⇒ repetitive/boilerplate text; the natural
    * pre-filter before paying for real compression). Unlike deflate,
    * entropy is exactly replayable in SQL, so this one is
    * oracle-checked end to end.
    *
    * Exactness: character counts are integers; each p·ln p contribution
    * is rounded to DECIMAL(20,12) before the per-document sum (the PMI
    * ln treatment — order-independent), and the single /ln2 division
    * happens once at the end in doubles.
    *
    * Scale shape: the char explode is collapsed by a partial-aggregated
    * groupBy on (doc, char) — per-char rows never cross the wire raw —
    * then one more doc-keyed exchange carries only the (doc, char,
    * count) table (≤ alphabet-size rows per document) through the total
    * window and the closing aggregate.
    * Output: (idCol, n_chars_counted, n_distinct_chars, entropy_bits). */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(idCol), explode(split(col(textCol), "")).as("__ch"))
      .filter(col("__ch") =!= "")
      .groupBy(col(idCol), col("__ch"))
      .agg(count(lit(1)).as("__c"))
    val withN = counts.withColumn("__n",
      sum(col("__c")).over(Window.partitionBy(col(idCol))))
    val p = col("__c").cast("double") / col("__n").cast("double")
    withN
      .withColumn("__contrib", (p * log(p)).cast("decimal(20,12)"))
      .groupBy(col(idCol))
      .agg(
        max(col("__n")).as("n_chars_counted"),
        count(lit(1)).as("n_distinct_chars"),
        (negate(sum(col("__contrib"))).cast("double") / lit(Ln2))
          .as("entropy_bits"))
  }
}
