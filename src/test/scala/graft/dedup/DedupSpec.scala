package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (4L, "completely different words entirely here now today friends")
  ).toDF("doc_id", "text")

  test("exact dedup keeps the minimum id per content group") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    assert(groups.count() == 3)
    val dupGroup = groups.filter(col("n_docs") === 2).collect().head
    assert(dupGroup.getAs[Long]("keeper_id") == 1L)
    val survivors = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 4L))
  }

  test("exact dedup normalizes whitespace and case") {
    val messy = Seq((1L, "Hello  World"), (2L, "  hello world "))
      .toDF("doc_id", "text")
    assert(Dedup.exactGroups(messy, "doc_id", "text").count() == 1)
  }

  test("incremental minhash equals full-corpus LSH for increment pairs") {
    // corpus = docs 1..350, increment = docs 351..500 of the real corpus:
    // candidatesAgainst(new, bandTable(corpus)) must produce exactly the
    // full-run pairs that touch the increment
    val all = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = all.filter(col("doc_id") < 350)
    val fresh = all.filter(col("doc_id") >= 350)
    val (k, bandSize) = (12, 3)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignatures(Dedup.shingleTable(df, "doc_id", "text", 3), "doc_id", k)

    val corpusBands = Dedup.bandTable(sigs(corpus), "doc_id", k, bandSize)
    val incremental = Dedup
      .minhashCandidatesAgainst(sigs(fresh), corpusBands, "doc_id", k, bandSize)
      .select("doc_new", "doc_match").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet

    val full = Dedup.minhashCandidates(sigs(all), "doc_id", k, bandSize)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val fullTouchingNew = full.filter { case (a, b) => a >= 350 || b >= 350 }
    assert(incremental === fullTouchingNew)
    assert(incremental.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("incremental simhash equals full-corpus pairs for increment pairs") {
    // same contract as the incremental minhash path: new batch vs the
    // stored signature table == the full run restricted to pairs that
    // touch the increment; the stored table is never re-hashed
    val all = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = all.filter(col("doc_id") < 350)
    val fresh = all.filter(col("doc_id") >= 350)
    val stored = Dedup.simhashTableMd5(corpus, "doc_id", "text")
      .localCheckpoint()
    val raw = Dedup
      .simhashPairsMd5Against(fresh, stored, "doc_id", "text", maxHamming = 12)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    assert(raw.length == raw.toSet.size, "pair emitted twice")
    val incremental = raw
      .map { case (a, b, h) => (math.min(a, b), math.max(a, b), h) }.toSet
    val full = Dedup.simhashPairsMd5(all, "doc_id", "text", maxHamming = 12)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val fullTouchingNew = full.filter { case (a, b, _) => a >= 350 || b >= 350 }
    assert(incremental === fullTouchingNew)
    assert(incremental.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("incremental ngram jaccard equals full-corpus pairs for increment pairs") {
    val all = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = all.filter(col("doc_id") < 300)
    val batch1 = all.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val batch2 = all.filter(col("doc_id") >= 400)
    val stored = Dedup.shingleTable(corpus, "doc_id", "text", 3)
      .localCheckpoint()
    def norm(t: (Long, Long, Long, Long, Long, Double)) =
      if (t._1 < t._2) t else (t._2, t._1, t._3, t._5, t._4, t._6)
    def full(batch: org.apache.spark.sql.DataFrame) = Dedup
      .ngramJaccardPairs(corpus.unionByName(batch), "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    def inc(batch: org.apache.spark.sql.DataFrame) = Dedup
      .ngramJaccardPairsAgainst(batch, stored, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val raw1 = inc(batch1)
    assert(raw1.length == raw1.toSet.size, "pair emitted twice")
    val exp1 = full(batch1).filter(t =>
      t._1 >= 300 && t._1 < 400 || t._2 >= 300 && t._2 < 400)
    assert(raw1.map(norm).toSet === exp1.map(norm))
    assert(raw1.nonEmpty, "fixture should contain near-dup pairs")
    // the SAME stored table serves the next batch unchanged
    val raw2 = inc(batch2)
    val exp2 = full(batch2).filter(t => t._1 >= 400 || t._2 >= 400)
    assert(raw2.map(norm).toSet === exp2.map(norm))
    assert(raw2.nonEmpty)
  }

  test("incremental prefix jaccard equals the naive incremental path") {
    // the md5-ordered PPJoin path must be lossless: same pairs, same
    // values as the raw shingle join, from the same stored corpus
    val all = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = all.filter(col("doc_id") < 350)
    val fresh = all.filter(col("doc_id") >= 350)
    val naive = Dedup.ngramJaccardPairsAgainst(fresh,
        Dedup.shingleTable(corpus, "doc_id", "text", 3).localCheckpoint(),
        "doc_id", "text", 3, 0.5)
      .collect().map(_.toSeq).toSet
    val prefix = Dedup.ngramJaccardPairsAgainstPrefix(fresh,
        Dedup.docShingleSets(corpus, "doc_id", "text", 3).localCheckpoint(),
        "doc_id", "text", 3, 0.5)
      .collect().map(_.toSeq).toSet
    assert(prefix == naive)
    assert(prefix.nonEmpty)
  }

  test("ngram jaccard finds near dups above threshold only") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical: jaccard 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("prefix-filtered jaccard equals brute force on the real corpus") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val brute = Dedup.ngramJaccardPairs(real, "doc_id", "text", 3, 0.5)
      .collect().map(_.toSeq).toSet
    val prefix = Dedup.ngramJaccardPairsPrefix(real, "doc_id", "text", 3, 0.5)
      .collect().map(_.toSeq).toSet
    assert(prefix == brute)
    assert(brute.nonEmpty) // sf0.001 contains planted near-dups
  }

  test("minhash signatures are identical for identical docs and LSH finds them") {
    val sig = Dedup.minhashSignatures(
      Dedup.shingleTable(docs, "doc_id", "text", 3), "doc_id", 8)
    val s1 = sig.filter(col("doc_id") === 1L).drop("doc_id").collect().head
    val s2 = sig.filter(col("doc_id") === 2L).drop("doc_id").collect().head
    assert(s1 == s2)
    val cands = Dedup.minhashCandidates(sig, "doc_id", 8, 2)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash of identical docs is equal; near dups are close; pairs found") {
    val hashed = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    // The bulk (explode+aggregate) form must agree with the row-local fold.
    val bulk = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(bulk == hashed)
    assert(hashed(1L) == hashed(2L))
    val hammingNear = java.lang.Long.bitCount(hashed(1L) ^ hashed(3L))
    val hammingFar = java.lang.Long.bitCount(hashed(1L) ^ hashed(4L))
    assert(hammingNear < hammingFar)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("approx_count_distinct stays within its error bound vs exact") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val rows = graft.QueriesExtra.qApproxDistinct(spark, "/root/testdata/sf0.01")
      .select("l_returnflag", "n_exact", "approx_ok")
      .as[(String, Long, Boolean)].collect()
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("d"))
      .as[(String, Long)].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (k, nExact, ok) =>
      assert(nExact == exact(k), s"$k: n_exact $nExact vs ${exact(k)}")
      assert(ok, s"$k: sketch outside 10% of $nExact")
    }
  }

  test("dedup is idempotent: re-running on survivors changes nothing") {
    val once = Dedup.exactDedup(docs, "doc_id", "text")
    val twice = Dedup.exactDedup(once, "doc_id", "text")
    assert(once.count() == twice.count())
  }
}
