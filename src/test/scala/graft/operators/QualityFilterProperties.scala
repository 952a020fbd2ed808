package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSession

/** Model-based laws for QualityFilter: the Spark column arithmetic is
  * compared against an independent sequential model on random corpora
  * drawn from a vocabulary that deliberately includes stopwords, symbol
  * markers, digits, and punctuated words — so every rule's edge (adjacent
  * stopwords that the replace-and-measure idiom undercounts, symbol
  * tokens, short tails, blacklist hits) occurs constantly. */
object QualityFilterProperties extends Properties("QualityFilter") {

  private lazy val spark = TestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val word = Gen.oneOf(
    "the", "a", "of", "alfa", "beta", "#", "...", "42", "fin.", "qm?")
  private val docText: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 7)
    texts <- Gen.listOfN(n, docText)
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def df(corpus: List[(Long, String)]) = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  private def collapse(text: String): String =
    text.trim.replaceAll("\\s+", " ")

  /** Non-overlapping left-to-right occurrence count — the exact
    * replace-and-measure semantics the Column code uses (NOT a regex
    * count: adjacent stopwords undercount identically on both sides). */
  private def occ(s: String, m: String): Int =
    (s.length - s.replace(m, "").length) / m.length

  private val th = QualityFilter.GopherThresholds(
    minWords = 2, maxWords = 9, minMeanWordLen = 1.5, maxMeanWordLen = 4.5,
    maxSymbolRatio = 0.3, minAlphaFrac = 0.5, minStopHits = 1)

  property("gopherStats equals the sequential model") =
    forAll(corpusGen) { corpus =>
      val model = corpus.map { case (id, text) =>
        val s = collapse(text)
        val n = if (s.isEmpty) 0 else s.count(_ == ' ') + 1
        val mean = if (n == 0) 0.0
          else (s.length - (n - 1)).toDouble / n.toDouble
        val symHits = (s.length - s.replace("#", "").length).toDouble / 1 +
          (s.length - s.replace("...", "").length).toDouble / 3
        val sym = if (n == 0) 0.0 else symHits / n.toDouble
        val alphaWords =
          if (s.isEmpty) 0
          else s.split(" ", -1).count(_.exists(c => c.isLetter))
        val alpha = if (n == 0) 0.0 else alphaWords.toDouble / n.toDouble
        val p = " " + collapse(text.toLowerCase) + " "
        val stop = QualityFilter.StopMarkers
          .map(m => (p.length - p.replace(m, "").length).toDouble / m.length)
          .sum
        val keep = n >= th.minWords && n <= th.maxWords &&
          mean >= th.minMeanWordLen && mean <= th.maxMeanWordLen &&
          sym <= th.maxSymbolRatio && alpha >= th.minAlphaFrac &&
          stop >= th.minStopHits
        (id, n, mean, sym, alpha, stop, keep)
      }.toSet
      val got = {
        import spark.implicits._
        QualityFilter.gopherStats(df(corpus), "doc_id", "text", th)
          .as[(Long, Int, Double, Double, Double, Double, Boolean)]
          .collect().toSet
      }
      got == model
    }

  property("cleanLines equals the sequential model") =
    forAll(corpusGen, Gen.choose(1, 4), Gen.choose(1, 3), Gen.choose(1, 2),
        Gen.oneOf(true, false)) { (corpus, w, minLineWords, minKept, punct) =>
      val rules = QualityFilter.LineRules(
        minWordsPerLine = minLineWords, requireTerminalPunct = punct,
        blacklist = Seq("alfa", "Qm?"), minKeptLines = minKept)
      val model = corpus.flatMap { case (id, text) =>
        val toks = collapse(text).split(" ", -1).toVector
        val lines = toks.grouped(w).map(_.mkString(" ")).toVector
        val kept = lines.filter { l =>
          val words = if (l.isEmpty) 0 else l.count(_ == ' ') + 1
          val punctOk = !punct ||
            Seq(".", "!", "?", "\"").exists(l.endsWith)
          val blackOk = !Seq("alfa", "qm?").exists(l.toLowerCase.contains)
          words >= minLineWords && punctOk && blackOk
        }
        if (kept.size >= minKept)
          Some((id, kept.mkString(" "), kept.size))
        else None
      }.toSet
      val got = {
        import spark.implicits._
        QualityFilter.cleanLines(df(corpus), "doc_id", "text", w, rules)
          .as[(Long, String, Int)].collect().toSet
      }
      got == model
    }
}
