package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: DataFrame, d: Int): Set[(Long, Long, Long)] = {
    val a = df.select(col("id").as("id_a"), col("s").as("sa"))
    val b = df.select(col("id").as("id_b"), col("s").as("sb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("sa"), col("sb")) <= d)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def pruned(df: DataFrame, d: Int, q: Int = 2) =
    FuzzyJoin.editDistancePairs(df, "id", "s", d, q)
      .as[(Long, Long, Long)].collect().toSet

  test("equals brute force on real customer names, d=1 and d=2") {
    val c = graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    Seq(1, 2).foreach { d =>
      val got = pruned(c, d)
      val expected = brute(c, d)
      assert(got == expected, s"d=$d mismatch")
      assert(expected.nonEmpty, s"d=$d: fixture should produce pairs")
    }
  }

  test("deletionPairs equals brute force and the prefix path, d=1 and d=2") {
    val c = graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    Seq(1, 2).foreach { d =>
      val got = FuzzyJoin.deletionPairs(c, "id", "s", d)
        .as[(Long, Long, Long)].collect().toSet
      val expected = brute(c, d)
      assert(got == expected, s"d=$d mismatch")
      assert(expected.nonEmpty, s"d=$d: fixture should produce pairs")
    }
  }

  test("deletionPairs handles empty/short/null strings and exact dups") {
    val df = Seq((1L, Some("")), (2L, Some("")), (3L, Some("a")),
      (4L, Some("ab")), (5L, None), (6L, Some("ab")))
      .toDF("id", "s")
    val got = FuzzyJoin.deletionPairs(df, "id", "s", 1)
      .as[(Long, Long, Long)].collect().toSet
    // ""~"" 0, ""~"a" 1, "a"~"ab" 1, "ab"~"ab" 0 — and NULL never matches
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L), (3L, 6L, 1L), (4L, 6L, 0L)))
  }

  test("deletionJoin/bestMatchDeletion equal the prefix two-table path") {
    val c = graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val master = c.select(col("c_custkey").as("mid"), col("c_name").as("s"))
    val dirty = c.select(col("c_custkey").as("qid"),
      when(col("c_custkey") % 2 === 0,
        concat(substring(col("c_name"), 1, 9), expr("substring(c_name, 11)")))
        .otherwise(col("c_name")).as("s"))
    Seq(1, 2).foreach { d =>
      val viaDel = FuzzyJoin.deletionJoin(dirty, master, "qid", "mid", "s", d)
        .as[(Long, Long, Long)].collect().toSet
      val viaPfx = FuzzyJoin.editDistanceJoin(dirty, master, "qid", "mid", "s", d)
        .as[(Long, Long, Long)].collect().toSet
      assert(viaDel == viaPfx && viaPfx.nonEmpty, s"join d=$d")
      val bmDel = FuzzyJoin.bestMatchDeletion(dirty, master, "qid", "mid", "s", d)
        .as[(Long, Long, Long)].collect().toSet
      val bmPfx = FuzzyJoin.bestMatch(dirty, master, "qid", "mid", "s", d)
        .as[(Long, Long, Long)].collect().toSet
      assert(bmDel == bmPfx && bmPfx.nonEmpty, s"bestMatch d=$d")
    }
  }

  test("incremental deletion matching: 3-batch ingest equals full corpus") {
    val c = graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val full = FuzzyJoin.deletionPairs(c, "id", "s", 1)
      .select(least(col("id_a"), col("id_b")),
        greatest(col("id_a"), col("id_b")), col("dist"))
      .as[(Long, Long, Long)].collect().toSet
    var corpus = c.limit(0)
    var variants = FuzzyJoin.deletionVariants(c.limit(0), "id", "s", 1)
      .localCheckpoint()
    val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    (0 until 3).foreach { k =>
      val batch = c.filter(col("id") % 3 === k)
      val pairs = FuzzyJoin
        .deletionPairsAgainst(batch, corpus, variants, "id", "s", 1)
        .select(least(col("id_a"), col("id_b")),
          greatest(col("id_a"), col("id_b")), col("dist"))
        .as[(Long, Long, Long)].collect()
      // each pair must surface exactly once (when its later member lands)
      pairs.foreach { p => assert(!got(p), s"pair $p found twice"); got += p }
      corpus = corpus.unionByName(batch)
      variants = variants
        .unionByName(FuzzyJoin.deletionVariants(batch, "id", "s", 1))
        .localCheckpoint()
    }
    assert(got.toSet == full && full.nonEmpty)
  }

  test("deletionPairs == brute on dense random binary-alphabet strings") {
    // {a,b} strings of length 0..6: near-maximal deletion-key collisions
    // and many true pairs at every distance — the adversarial regime for
    // a candidate screen (seeded, deterministic)
    val rnd = new scala.util.Random(42)
    val strs = (1 to 120).map { i =>
      val n = rnd.nextInt(7)
      (i.toLong, (1 to n).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString)
    }
    val df = strs.toDF("id", "s")
    Seq(1, 2).foreach { d =>
      val got = FuzzyJoin.deletionPairs(df, "id", "s", d)
        .as[(Long, Long, Long)].collect().toSet
      val expected = brute(df, d)
      assert(got == expected, s"d=$d")
      assert(expected.nonEmpty)
    }
  }

  test("short strings (below the prefix guarantee) fall back losslessly") {
    // every string here has <= d*q grams at q=2, d=2 — the prefix lemma
    // gives no guarantee, so the short bucket must carry all of them,
    // including the empty string and strings shorter than q
    val df = Seq(
      (1L, ""), (2L, "a"), (3L, "b"), (4L, "ab"), (5L, "ba"),
      (6L, "abc"), (7L, "xy"), (8L, "abcd")).toDF("id", "s")
    Seq(1, 2).foreach { d =>
      assert(pruned(df, d) == brute(df, d), s"d=$d mismatch")
    }
  }

  test("mixed short and long strings cross the bucket boundary") {
    // "abcde" (4 grams > d*q=2 at d=1) vs "abcd" (3 grams) vs "abc"
    // (2 grams, short): short x long pairs must come via the prefix
    // join (the longer side's guarantee), short x short via the bucket
    val df = Seq(
      (1L, "abc"), (2L, "abcd"), (3L, "abcde"), (4L, "bbcde"),
      (5L, "zzzzz"), (6L, "ab")).toDF("id", "s")
    Seq(1, 2).foreach { d =>
      assert(pruned(df, d) == brute(df, d), s"d=$d mismatch")
    }
  }

  test("NULL strings never match") {
    val df = Seq((1L, "abc"), (2L, "abc")).toDF("id", "s")
      .union(Seq((3L, null.asInstanceOf[String])).toDF("id", "s"))
    assert(pruned(df, 2) == Set((1L, 2L, 0L)))
  }

  test("bestMatch picks the closest right row, smallest id on ties") {
    val master = Seq(
      (10L, "alpha"), (11L, "alphb"), (12L, "gamma")).toDF("id", "s")
    val dirty = Seq(
      (1L, "alpha"),  // exact: dist 0 to 10
      (2L, "alphc"),  // dist 1 to BOTH 10 and 11 -> tie, pick 10
      (3L, "gamm"),   // dist 1 to 12
      (4L, "zzzzzz")  // no match within 2
    ).toDF("id", "s")
    val got = FuzzyJoin.bestMatch(dirty, master, "id", "id", "s", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 0L), (2L, 10L, 1L), (3L, 12L, 1L)))
  }

  test("prefix pruning screens candidates well below the quadratic") {
    // on realistic varied text (part names: random word combinations)
    // the df-rarest-gram prefixes must cut the verify set by orders of
    // magnitude. (Customer names are the pruning worst case — every
    // name is within a handful of edits of every other, so most pairs
    // are genuine candidates; the equivalence tests keep that fixture.)
    val p = graft.Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_partkey").as("id"), col("p_name").as("s"))
    val n = p.count()
    val total = n * (n - 1) / 2
    val candidates = FuzzyJoin.selfCandidates(p, "id", "s",
      maxDist = 1, q = 2).count()
    assert(candidates * 10 < total,
      s"prefix join screened $candidates of $total pairs — not pruning")
  }
}
