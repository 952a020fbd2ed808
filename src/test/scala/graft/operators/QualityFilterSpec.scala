package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** QualityFilter — Gopher document rules and C4 line rules, including
  * the terminal-punctuation rule the oracle query can't exercise (the
  * synthetic corpus carries no sentence punctuation). */
class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  private def th = QualityFilter.GopherThresholds(
    minWords = 3, maxWords = 6, minMeanWordLen = 2.0, maxMeanWordLen = 8.0,
    maxSymbolRatio = 0.2, minAlphaFrac = 0.75, minStopHits = 1)

  test("gopherStats computes the metrics and applies every rule") {
    val docs = Seq(
      (1L, "the quick brown fox"),          // passes everything
      (2L, "the cat"),                      // too few words
      (3L, "the one two three four five six seven"), // too many words
      (4L, "the fox # # # #"),              // symbol ratio 4/6 > 0.2
      (5L, "the 12 34 56"),                 // alpha frac 1/4 < 0.75
      (6L, "quick brown fox jumps")         // no stopword hit
    ).toDF("doc_id", "text")
    val out = QualityFilter.gopherStats(docs, "doc_id", "text", th)
      .orderBy("doc_id")
      .select($"doc_id", $"n_words", $"stop_hits", $"keep")
      .as[(Long, Int, Double, Boolean)].collect().toSeq
    assert(out.map(r => r._1 -> r._4) ==
      Seq(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false,
        6L -> false))
    // spot-check metric arithmetic on doc 1: 4 words, 1 'the' hit
    assert(out.head._2 == 4 && out.head._3 == 1.0)
  }

  test("gopherStats metric values: mean word length, symbol and alpha ratios") {
    val docs = Seq((1L, "ab cdef # ...")).toDF("doc_id", "text")
    val m = QualityFilter.gopherStats(docs, "doc_id", "text", th)
      .select($"n_words", $"mean_word_len", $"symbol_ratio", $"alpha_frac")
      .as[(Int, Double, Double, Double)].head()
    // 4 tokens; word chars = 13 - 3 separators = 10 -> mean 2.5
    assert(m._1 == 4 && m._2 == 2.5)
    // one '#' + one '...' = 2 symbol hits / 4 words
    assert(m._3 == 0.5)
    // 'ab' and 'cdef' are alphabetic -> 2/4
    assert(m._4 == 0.5)
  }

  test("gopherStats handles empty text without dividing by zero") {
    val out = QualityFilter.gopherStats(
        Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"),
        "doc_id", "text", th)
      .select($"n_words", $"mean_word_len", $"symbol_ratio", $"alpha_frac",
        $"keep")
      .as[(Int, Double, Double, Double, Boolean)].collect().toSeq
    assert(out == Seq((0, 0.0, 0.0, 0.0, false), (0, 0.0, 0.0, 0.0, false)))
  }

  test("gopherFilter keeps original columns for surviving docs only") {
    val docs = Seq((1L, "the quick brown fox", "x"), (2L, "the cat", "y"))
      .toDF("doc_id", "text", "extra")
    val kept = QualityFilter.gopherFilter(docs, "text", th)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "extra"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("cleanLines drops short, blacklisted, and unpunctuated lines") {
    val rules = QualityFilter.LineRules(
      minWordsPerLine = 3, requireTerminalPunct = true,
      blacklist = Seq("lorem ipsum"), minKeptLines = 1)
    // wordsPerLine = 4 chunks each doc into 4-word pseudo-lines
    val docs = Seq(
      // line 1 punctuated + long enough; line 2 unpunctuated -> dropped
      (1L, "alpha beta gamma delta. epsilon zeta eta theta"),
      // line 1 blacklisted, line 2 unpunctuated -> doc dies (< 1 line)
      (2L, "this has lorem ipsum. second line no punct"),
      // tail line has 2 words -> dropped even though punctuated
      (3L, "one two three four. five six.")
    ).toDF("doc_id", "text")
    val out = QualityFilter.cleanLines(docs, "doc_id", "text", 4, rules)
      .orderBy("doc_id")
      .select($"doc_id", $"cleaned_text", $"n_lines_kept")
      .as[(Long, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha beta gamma delta.", 1),
      (3L, "one two three four.", 1)))
  }

  test("cleanLines enforces the minimum-kept-lines document rule") {
    val rules = QualityFilter.LineRules(
      minWordsPerLine = 1, requireTerminalPunct = false,
      blacklist = Seq("drop"), minKeptLines = 2)
    val docs = Seq(
      (1L, "a b c d"),            // 2 lines of 2 -> kept
      (2L, "drop me a b")         // line 1 blacklisted -> only 1 kept -> out
    ).toDF("doc_id", "text")
    val out = QualityFilter.cleanLines(docs, "doc_id", "text", 2, rules)
      .select($"doc_id", $"n_lines_kept").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 2)))
  }

  test("cleanLines preserves original line order in the reassembly") {
    val rules = QualityFilter.LineRules(
      minWordsPerLine = 1, requireTerminalPunct = false,
      blacklist = Seq("zzz"), minKeptLines = 1)
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val out = QualityFilter.cleanLines(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 3, rules)
      .select($"cleaned_text").as[String].head()
    assert(out == text)
  }

  test("blacklist matching is case-insensitive") {
    val rules = QualityFilter.LineRules(
      minWordsPerLine = 1, requireTerminalPunct = false,
      blacklist = Seq("Cookie"), minKeptLines = 1)
    val docs = Seq((1L, "COOKIE banner here"), (2L, "plain text here"))
      .toDF("doc_id", "text")
    val out = QualityFilter.cleanLines(docs, "doc_id", "text", 10, rules)
      .select($"doc_id").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }
}
