package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * token counting, stopword/marker ratios, language-ID scoring, quality
  * scoring, fingerprinting, word shingles.
  *
  * All of it is Column expressions (whole-stage codegen; zero shuffles for
  * per-document metrics). Counting uses the replace-and-measure idiom —
  * `(len(s) - len(replace(s, m, ''))) / len(m)` — which is engine-portable
  * (same non-overlapping left-to-right replace semantics everywhere),
  * unlike regex token extraction whose edge cases differ per engine.
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed form; the canonical token stream. */
  def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Normalized form for exact-dedup grouping: collapsed + lowercased. */
  def normalize(c: Column): Column = lower(collapseWs(c))

  /** Whitespace token count of the collapsed form. */
  def tokenCount(c: Column): Column = tokenCountCollapsed(collapseWs(c))

  /** Token count of an ALREADY-collapsed string (single spaces, no
    * leading/trailing whitespace) — the one copy of the
    * replace-and-measure idiom, for callers whose input is collapsed by
    * construction (chunker output, pseudo-lines). */
  def tokenCountCollapsed(s: Column): Column =
    when(s === "", lit(0))
      .otherwise(length(s) - length(replace(s, lit(" "), lit(""))) + 1)

  /** Number of non-overlapping occurrences of literal `m` in ` s `
    * (space-padded so word markers match at both ends). */
  def occurrences(c: Column, m: String): Column = {
    val padded = concat(lit(" "), collapseWs(c), lit(" "))
    (length(padded) - length(replace(padded, lit(m), lit("")))) / lit(m.length)
  }

  /** Language marker words (space-delimited matches). Order matters: ties
    * resolve to the earlier entry, so keep this list priority-ordered. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " die ", " das "),
    "fr" -> Seq(" le ", " les ", " une "),
    "pt" -> Seq(" o ", " os ", " um "))

  def langScore(c: Column, markers: Seq[String]): Column =
    markers.map(m => occurrences(c, m)).reduce(_ + _)

  /** Heuristic language-ID: argmax of marker-word counts with fixed
    * priority tiebreak (strictly-greater comparisons in list order);
    * "und" when every score is zero. */
  def langId(c: Column): Column = {
    val lowered = lower(c)
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(lowered, ms) }
    val best = scores.tail.foldLeft((scores.head._2, lit(scores.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (when(score > bestScore, score).otherwise(bestScore),
         when(score > bestScore, lit(lang)).otherwise(bestLang))
    }
    when(best._1 > 0, best._2).otherwise(lit("und"))
  }

  /** Punctuation-character ratio of the collapsed text (0 for empty).
    * Counted by removing the punctuation set with translate — portable
    * (regex character-class semantics differ across engines). */
  val PunctChars = ".,;:!?\"'()-"
  def punctRatio(c: Column): Column = {
    val s = collapseWs(c)
    when(length(s) === 0, lit(0.0))
      .otherwise(
        (length(s) - length(translate(s, PunctChars, ""))).cast("double") /
          length(s).cast("double"))
  }

  /** Stopword markers used by [[qualityScore]] and the Gopher stopword
    * floor (`QualityFilter.StopMarkers`) — one constant so the Spark
    * expressions and every SQL oracle fragment stay in lockstep. */
  val QualityStopMarkers: Seq[String] = Seq(" the ", " a ", " of ")

  /** Composite quality score in [0,1]: length credit, stopword credit,
    * token-shape credit. Deterministic double arithmetic. NULL text
    * scores NULL — without the guard, `least(1.0, NULL)` SKIPS the null
    * (Spark and DuckDB both follow the Postgres rule), so an unscorable
    * document would silently earn the maximum length+stopword credits. */
  def qualityScore(c: Column): Column = {
    val tokens = tokenCount(c)
    val stopRatio = langScore(lower(c), QualityStopMarkers) /
      (tokens.cast("double") + lit(1.0))
    val s = collapseWs(c)
    val avgTokLen = (length(s) - (tokens - lit(1))).cast("double") /
      (tokens.cast("double") + lit(1.0))
    val score =
      least(lit(1.0), tokens.cast("double") / lit(50.0)) * lit(0.4) +
        least(lit(1.0), stopRatio * lit(5.0)) * lit(0.3) +
        when(avgTokLen.between(3.0, 10.0), lit(0.3)).otherwise(lit(0.0))
    when(c.isNull, lit(null).cast("double")).otherwise(score)
  }

  /** Latin accent folding (á→a, ç→c, ñ→n, both cases) — the
    * Brazilian-Portuguese name/municipality normalization step
    * (reference scope: custom_functions.py string cleaning) ahead of
    * joins and dedup: accented and unaccented spellings of the same
    * entity must collide. Pure per-codepoint `translate` — map-side,
    * codegen'd, and replayable on any engine with the same two literal
    * strings. Characters outside the map pass through (this is NOT full
    * Unicode NFD — it is the deterministic Latin-1/PT table, which is
    * the point: no locale/ICU dependence). */
  val AccentedChars = "áàâãäéèêëíìîïóòôõöúùûüçñýÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
  val FoldedChars = "aaaaaeeeeiiiiooooouuuucnyAAAAAEEEEIIIIOOOOOUUUUCNY"
  def foldAccents(c: Column): Column =
    translate(c, AccentedChars, FoldedChars)

  /** Content fingerprint: md5 of the normalized form (hex, engine-stable);
    * `short` variant keeps the first 16 hex chars (64 bits). */
  def fingerprint(c: Column): Column = md5(normalize(c))
  def fingerprintShort(c: Column): Column = substring(fingerprint(c), 1, 16)

  /** Distinct word n-gram shingles from a words-array column (array of
    * strings). Documents shorter than `n` words produce an empty array. */
  def wordShingles(wsCol: String, n: Int): Column = {
    val parts = (0 until n).map(j => s"$wsCol[i+$j]").mkString(", ")
    expr(
      s"""filter(
         |  transform(sequence(0, greatest(size($wsCol)-$n, 0)),
         |            i -> CASE WHEN i <= size($wsCol)-$n
         |                      THEN concat_ws(' ', $parts) END),
         |  x -> x IS NOT NULL)""".stripMargin)
  }
}
