package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.CacheScope
import graft.dedup.Dedup

/** The incremental-curation composition: snapshot diff -> quality
  * filtering of the increment only -> incremental minhash dedup against
  * the stored band table -> verified export. Each stage is spec'd and
  * oracled on its own; this suite pins the CROSS-OPERATOR contracts a
  * daily 100 TB pipeline relies on: restriction-equivalence of per-doc
  * curation, and incremental maintenance of the stored dedup state
  * equaling a full rebuild. */
class IncrementalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val gopher = QualityFilter.GopherThresholds(
    minWords = 3, maxWords = 50, minMeanWordLen = 1.0, maxMeanWordLen = 12.0,
    maxSymbolRatio = 0.5, minAlphaFrac = 0.5, minStopHits = 1)
  private val lines = QualityFilter.LineRules(
    minWordsPerLine = 1, requireTerminalPunct = false,
    blacklist = Seq("zzz"), minKeptLines = 1)
  private val K = 12
  private val BandSize = 3

  private def curate(docs: DataFrame): DataFrame =
    QualityFilter.cleanLines(
      QualityFilter.gopherFilter(docs, "text", gopher),
      "doc_id", "text", wordsPerLine = 4, lines)

  private def sigs(curated: DataFrame, scope: CacheScope): DataFrame =
    Dedup.minhashSignatures(
      scope.retain(Dedup.shingleTable(curated, "doc_id", "cleaned_text", 2)),
      "doc_id", K)

  // day-0 corpus: docs 1-5; doc 6 fails gopher (no stopword)
  private def day0 = Seq(
    (1L, "the quick brown fox jumps over a lazy dog"),
    (2L, "a completely different second document about the weather"),
    (3L, "the third document covers deterministic sampling of corpora"),
    (5L, "a document that will vanish from the next crawl"),
    (6L, "no stopwords here whatsoever")
  ).toDF("doc_id", "text")

  // day-1 crawl: doc 2 REVISED into a copy of doc 1, doc 10 ADDED as a
  // copy of doc 3, doc 5 removed, rest identical
  private def day1 = Seq(
    (1L, "the quick brown fox jumps over a lazy dog"),
    (2L, "the quick brown fox jumps over a lazy dog"),
    (3L, "the third document covers deterministic sampling of corpora"),
    (6L, "no stopwords here whatsoever"),
    (10L, "the third document covers deterministic sampling of corpora")
  ).toDF("doc_id", "text")

  test("diff -> curate increment == full recuration restricted to the diff") {
    val inc = CorpusDiff.changedRows(day0, day1, "doc_id", "text")
    assert(inc.select("doc_id").as[Long].collect().toSet == Set(2L, 10L))
    val curatedInc = curate(inc).as[(Long, String, Int)].collect().toSet
    val full = curate(day1)
      .filter($"doc_id".isin(2L, 10L)).as[(Long, String, Int)].collect().toSet
    assert(curatedInc == full,
      "per-doc curation must be restriction-equivalent over the diff")
  }

  test("incremental dedup of the curated increment finds cross-snapshot dups") {
    CacheScope.withScope { scope =>
      val bands0 = Dedup.bandTable(
        sigs(curate(day0), scope), "doc_id", K, BandSize)
      val inc = curate(CorpusDiff.changedRows(day0, day1, "doc_id", "text"))
      val pairs = Dedup.minhashCandidatesAgainst(
          sigs(inc, scope), bands0, "doc_id", K, BandSize, scope)
        .as[(Long, Long)].collect().toSet
      // revised doc 2 is now a copy of corpus doc 1; added doc 10 copies
      // corpus doc 3 — identical text => identical signatures => certain
      // candidates. Doc 2's STALE day-0 bands are also still in the
      // store, so (2,2) surfaces — the maintenance step below removes it.
      assert(pairs.contains((2L, 1L)) && pairs.contains((10L, 3L)))
    }
  }

  test("incrementally maintained band table == full rebuild") {
    CacheScope.withScope { scope =>
      val bands0 = Dedup.bandTable(
        sigs(curate(day0), scope), "doc_id", K, BandSize)
      // ONE diff feeds both the stale-id eviction and the increment
      // (the overload exists so this doesn't recompute the join)
      val d = CorpusDiff.diff(day0, day1, "doc_id", "text")
      val stale = d.filter($"status" =!= CorpusDiff.Added)
        .select($"doc_id").as[Long].collect().toSet
      val inc = curate(CorpusDiff.changedRows(d, day1, "doc_id"))
      val bands1 = bands0.filter(!$"doc_id".isin(stale.toSeq: _*))
        .unionByName(Dedup.bandTable(sigs(inc, scope), "doc_id", K, BandSize))
      val rebuilt = Dedup.bandTable(
        sigs(curate(day1), scope), "doc_id", K, BandSize)
      val asSet = (df: DataFrame) =>
        df.as[(Long, Int, String)].collect().toSet
      assert(asSet(bands1) == asSet(rebuilt),
        "incremental state maintenance must equal a full rebuild")
    }
  }

  test("the curated increment exports with a verifiable manifest") {
    val dir = java.nio.file.Files.createTempDirectory("inc_export").toString
    val inc = curate(CorpusDiff.changedRows(day0, day1, "doc_id", "text"))
    TrainingExport.exportJsonl(inc, dir, shards = 2, orderCol = "doc_id")
    TrainingExport.writeManifest(spark, dir)
    assert(TrainingExport.verifyExport(spark, dir).isEmpty,
      "fresh export must verify clean")
  }
}
