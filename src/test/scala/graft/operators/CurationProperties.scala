package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSession
import graft.core.CacheScope

/** Model-based ScalaCheck laws for the curation operators: each Spark
  * implementation is compared against an independent sequential Scala
  * model on random corpora drawn from a tiny vocabulary (so lines,
  * tokens, and shingles collide constantly — the regime where chunking
  * and counting bugs live). Random inputs cover edge shapes the fixture
  * specs don't: empty documents, single-word documents, documents
  * shorter than a line/shingle, within-document repetition. */
object CurationProperties extends Properties("Curation") {

  private lazy val spark = TestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val word = Gen.oneOf("alfa", "beta", "gama", "delta", "eps", "zeta")
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

  /** Same tokenization the operators use: collapse whitespace, split on
    * single spaces ('' yields one empty token, as Spark's split does). */
  private def toks(text: String): Vector[String] =
    text.trim.replaceAll("\\s+", " ").split(" ", -1).toVector

  property("LineDedup.stats equals the sequential model") =
    forAll(corpusGen, Gen.choose(1, 4)) { (corpus, w) =>
      val lines = corpus.map { case (id, t) =>
        id -> toks(t).grouped(w).map(_.mkString(" ")).toVector
      }
      val occ = lines.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      val model = lines.map { case (id, ls) =>
        val dup = ls.count(l => occ(l) > 1).toLong
        (id, ls.size.toLong, dup, dup * 1000000L / ls.size)
      }.toSet
      val got = CacheScope.withScope { scope =>
        import spark.implicits._
        LineDedup.stats(df(corpus), "doc_id", "text", w, scope = scope)
          .as[(Long, Long, Long, Long)].collect().toSet
      }
      got == model
    }

  property("RareTokens.rarity equals the sequential model") =
    forAll(corpusGen, Gen.choose(1L, 6L)) { (corpus, rb) =>
      val docToks = corpus.map { case (id, t) => id -> toks(t) }
      val occ = docToks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
      val model = docToks.map { case (id, ts) =>
        val dfs = ts.map(occ)
        val rare = dfs.count(_ < rb).toLong
        (id, ts.size.toLong, dfs.sum, dfs.min, rare, rare * 1000000L / ts.size)
      }.toSet
      val got = CacheScope.withScope { scope =>
        import spark.implicits._
        RareTokens.rarity(df(corpus), "doc_id", "text", rb, scope)
          .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      }
      got == model
    }

  property("RepeatedSpans.spans equals the sequential model") =
    forAll(corpusGen, Gen.choose(2, 3)) { (corpus, n) =>
      val minWords = n + 1
      val sh = corpus.flatMap { case (id, t) =>
        val ws = toks(t)
        if (ws.length >= n)
          (0 to ws.length - n).map(p => (id, p, ws.slice(p, p + n).mkString(" ")))
        else Nil
      }
      val occ = sh.groupBy(_._3).view.mapValues(_.size)
      val model = sh.filter(s => occ(s._3) > 1)
        .groupBy(_._1)
        .flatMap { case (id, ps) =>
          val sorted = ps.map(_._2).sorted
          val islands = sorted.foldLeft(List.empty[List[Int]]) {
            case ((h @ (last :: _)) :: t, p) if p == last + 1 => (p :: h) :: t
            case (acc, p) => List(p) :: acc
          }
          islands.map(is => (id, is.min, is.size.toLong + n - 1))
            .filter(_._3 >= minWords)
        }.toSet
      val got = CacheScope.withScope { scope =>
        import spark.implicits._
        RepeatedSpans.spans(df(corpus), "doc_id", "text", n, minWords, scope)
          .as[(Long, Int, Long)].collect().toSet
      }
      got == model
    }

  property("Chunking.slidingChunks equals the sequential model") =
    forAll(corpusGen, Gen.choose(2, 5), Gen.choose(0, 1)) {
      (corpus, maxW, ov) =>
        val stride = maxW - ov
        val model = corpus.flatMap { case (id, t) =>
          val ws = toks(t)
          val n = ws.length
          val nc = math.max((n - ov + stride - 1) / stride, 1)
          (0 until nc).map { i =>
            val slice = ws.slice(i * stride, i * stride + maxW)
            val text = slice.mkString(" ")
            val words = if (text.isEmpty) 0 else text.count(_ == ' ') + 1
            (id, i, text, words)
          }
        }.toSet
        val got = {
          import spark.implicits._
          Chunking.slidingChunks(df(corpus), "doc_id", "text", maxW, ov)
            .as[(Long, Int, String, Int)].collect().toSet
        }
        got == model
    }

  property("CorpusDiff.diff equals the sequential model") =
    forAll(corpusGen, corpusGen) { (oldC, newC) =>
      // overlap the id spaces so added/removed/changed/unchanged all occur
      val oldM = oldC.toMap
      val newM = newC.map { case (id, t) => (id + oldC.size / 2) -> t }.toMap
      val norm = (t: String) => t.trim.replaceAll("\\s+", " ").toLowerCase
      val model = (oldM.keySet ++ newM.keySet).flatMap { id =>
        (oldM.get(id), newM.get(id)) match {
          case (None, Some(_)) => Some(id -> "added")
          case (Some(_), None) => Some(id -> "removed")
          case (Some(o), Some(n)) if norm(o) != norm(n) =>
            Some(id -> "changed")
          case _ => None
        }
      }
      val got = {
        import spark.implicits._
        CorpusDiff.diff(df(oldM.toList), df(newM.toList), "doc_id", "text")
          .as[(Long, String)].collect().toSet
      }
      got == model
    }

  property("RepeatedSpans.exciseSpans equals the sequential model") =
    forAll(corpusGen, Gen.choose(2, 3)) { (corpus, n) =>
      val minWords = n + 1
      // sequential spans (same model as above), then positional excision
      val sh = corpus.flatMap { case (id, t) =>
        val ws = toks(t)
        if (ws.length >= n)
          (0 to ws.length - n).map(p => (id, p, ws.slice(p, p + n).mkString(" ")))
        else Nil
      }
      val occ = sh.groupBy(_._3).view.mapValues(_.size)
      val spansById = sh.filter(s => occ(s._3) > 1)
        .groupBy(_._1)
        .map { case (id, ps) =>
          val sorted = ps.map(_._2).sorted
          val islands = sorted.foldLeft(List.empty[List[Int]]) {
            case ((h @ (last :: _)) :: t, p) if p == last + 1 => (p :: h) :: t
            case (acc, p) => List(p) :: acc
          }
          id -> islands.map(is => (is.min, is.size + n - 1))
            .filter(_._2 >= minWords)
        }.withDefaultValue(Nil)
      val model = corpus.map { case (id, t) =>
        val ws = toks(t)
        val kept = ws.zipWithIndex.collect {
          case (w, i) if !spansById(id).exists {
            case (s, len) => i >= s && i < s + len } => w
        }
        (id, kept.mkString(" "), kept.size.toLong)
      }.toSet
      val got = CacheScope.withScope { scope =>
        import spark.implicits._
        RepeatedSpans.exciseSpans(df(corpus), "doc_id", "text", n, minWords,
            scope)
          .as[(Long, String, Long)].collect().toSet
      }
      got == model
    }
}
