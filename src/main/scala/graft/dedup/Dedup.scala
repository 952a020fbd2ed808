package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.TextFunctions

/** Document deduplication operators for training-data pipelines.
  *
  * Scale notes (the design target is ~100 TB of documents):
  *  - Exact dedup is one hash-shuffle on a 32-char digest, not the text.
  *  - MinHash/LSH: cost is |docs| x shingles x K hashes, embarrassingly
  *    parallel; the only shuffles are the per-(doc,perm) min aggregation
  *    and the band-bucket self-join, whose fan-out is bounded by bucket
  *    size (band collisions), never all-pairs.
  *  - N-gram Jaccard: the naive form joins on the shingle, so
  *    frequency-skewed shingles dominate the shuffle on heavy-tailed
  *    corpora. [[ngramJaccardPairsPrefix]] is the skew-safe path — its
  *    rarest-first prefixes never join on stop-shingles, losslessly.
  *    Keep the naive form for oracle cross-checks and benign corpora.
  *
  * Cache lifecycle: operators that persist an intermediate (signature /
  * shingle / docset tables) take a [[graft.core.CacheScope]]; the default
  * `CacheScope.session` leaves caches to the session's end, while
  * `CacheScope.withScope` releases them after the consuming action.
  */
object Dedup {

  /** Exact duplicate groups by normalized content: one row per distinct
    * content with the surviving (minimum) id and the duplicate count. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        TextFunctions.fingerprint(col(textCol)).as("content_key"))
      .groupBy(col("content_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Survivors of exact dedup (keep the minimum id per content group). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      exactGroups(docs, idCol, textCol)
        .select(col("keeper_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** (id, shingle) pairs — distinct word n-gram shingles per document. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol),
        split(TextFunctions.collapseWs(col(textCol)), " ").as("ws"))
      .select(col(idCol), explode(TextFunctions.wordShingles("ws", n)).as("shingle"))
      .distinct()

  /** MinHash signatures: K independent "permutations" realized as
    * lexicographic minima of md5(k || ':' || shingle) — md5 hex strings
    * order uniformly, and the construction is engine-portable (the DuckDB
    * oracle computes the identical signature). One aggregation per doc. */
  def minhashSignatures(shingles: DataFrame, idCol: String, k: Int): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"mh_$i"))
    shingles.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: signatures banded `bandSize` rows per band; docs
    * sharing any band hash become a candidate pair (a < b, distinct).
    * Signatures are persisted before the self-join (the aggregation would
    * otherwise run once per join leg), and all bands join in a single
    * (band_idx, band_value) shuffle via posexplode. */
  def minhashCandidates(
      signatures: DataFrame, idCol: String, k: Int, bandSize: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sig = scope.retain(signatures)
    val banded = bandTable(sig, idCol, k, bandSize)
    val l = banded.select(col(idCol).as("doc_a"), col("band_idx"), col("band_val"))
    val r = banded.select(col(idCol).as("doc_b"), col("band_idx"), col("band_val"))
    l.join(r, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Signature rows exploded to (id, band_idx, band_val) — the persistable
    * LSH bucket table. At scale this is what you KEEP between pipeline
    * runs: incremental dedup joins new docs' bands against it instead of
    * re-hashing the corpus. */
  def bandTable(
      signatures: DataFrame, idCol: String, k: Int, bandSize: Int): DataFrame = {
    val bandVals = (0 until k / bandSize).map { b =>
      val cols = (b * bandSize until (b + 1) * bandSize).map(i => col(s"mh_$i"))
      md5(concat(cols: _*))
    }
    signatures.select(col(idCol),
      posexplode(array(bandVals: _*)).as(Seq("band_idx", "band_val")))
  }

  /** Incremental LSH dedup: candidate pairs between a NEW batch of docs
    * and an EXISTING corpus band table (from [[bandTable]], typically a
    * parquet table maintained across runs), plus pairs within the new
    * batch itself. Cost scales with the increment's band rows — the
    * corpus is only touched through the (band_idx, band_val) join, never
    * re-hashed: the continuous-ingest shape for corpus dedup at 100 TB.
    * Returns (doc_new, doc_corpus|doc_new2) pairs, new-batch-internal
    * pairs ordered a < b. */
  def minhashCandidatesAgainst(
      newSigs: DataFrame, corpusBands: DataFrame, idCol: String,
      k: Int, bandSize: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val newBands = scope.retain(bandTable(newSigs, idCol, k, bandSize))
    val n = newBands.select(col(idCol).as("doc_new"), col("band_idx"), col("band_val"))
    val c = corpusBands.select(col(idCol).as("doc_match"), col("band_idx"), col("band_val"))
    val vsCorpus = n.join(c, Seq("band_idx", "band_val"))
      .select(col("doc_new"), col("doc_match"))
    val n2 = newBands.select(col(idCol).as("doc_match"), col("band_idx"), col("band_val"))
    val within = n.join(n2, Seq("band_idx", "band_val"))
      .filter(col("doc_new") < col("doc_match"))
      .select(col("doc_new"), col("doc_match"))
    vsCorpus.unionByName(within).distinct()
  }

  /** Shared final scoring: jaccard from (doc_a, doc_b, inter, na, nb),
    * threshold filter, canonical column order — ONE copy behind every
    * jaccard operator so they cannot drift. */
  private def scoreJaccard(inter: DataFrame, threshold: Double): DataFrame =
    inter
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
        col("jaccard"))

  /** All-pairs n-gram Jaccard similarity >= `threshold`, computed by
    * joining on shared shingles (no candidate enumeration beyond docs that
    * actually share a shingle). */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      scope: CacheScope = CacheScope.session): DataFrame = {
    // The shingle table feeds three consumers (sizes + both join legs);
    // persist so the explode+distinct pass runs once; `scope` owns the
    // release (see CacheScope).
    val sh = scope.retain(shingleTable(docs, idCol, textCol, n))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col(idCol).as("doc_a"), col("shingle"))
      .join(sh.select(col(idCol).as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
    scoreJaccard(inter, threshold)
  }

  /** Incremental n-gram Jaccard pairs: a NEW batch of documents against
    * an EXISTING corpus shingle table (a stored [[shingleTable]] output,
    * maintained across runs — append the new batch's shingles after each
    * call), plus pairs within the batch. Only the increment is tokenized
    * and shingled; the corpus is touched through the shared-shingle join
    * plus one size aggregation RESTRICTED to matched documents. With ids
    * disjoint between batch and corpus, the result is exactly
    * [[ngramJaccardPairs]] over (corpus + batch) restricted to pairs
    * touching a new document (spec-pinned). Output shape matches
    * [[ngramJaccardPairs]] with doc_a = the new id; batch-internal pairs
    * a < b.
    *
    * Same caveat as [[ngramJaccardPairs]]: the raw-shingle join is
    * quadratic on stop-shingles (the module header's heavy-tail hazard).
    * For continuous ingest at corpus scale use
    * [[ngramJaccardPairsAgainstPrefix]], whose stored artifact carries a
    * FIXED global shingle order and therefore prunes losslessly across
    * ingests. */
  def ngramJaccardPairsAgainst(
      newDocs: DataFrame, corpusShingles: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val newSh = scope.retain(shingleTable(newDocs, idCol, textCol, n))
    val a = newSh.select(col(idCol).as("doc_a"), col("shingle"))
    val vsCorpus = a
      .join(corpusShingles.select(col(idCol).as("doc_b"), col("shingle")),
        Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
    val within = a
      .join(newSh.select(col(idCol).as("doc_b"), col("shingle")),
        Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
    // the pair-count table feeds the matched-doc derivation AND the
    // size joins — retained so the shingle join runs once
    val inter = scope.retain(vsCorpus.unionByName(within)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter")))
    // corpus sizes only for documents that actually matched (semi-join
    // keeps the aggregation proportional to the result, not the corpus)
    val matched = inter.select(col("doc_b")).distinct()
    val sizes = newSh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
      .unionByName(corpusShingles
        .join(matched, corpusShingles(idCol) === matched("doc_b"),
          "left_semi")
        .groupBy(col(idCol)).agg(count(lit(1)).as("n_sh")))
    scoreJaccard(inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n_sh").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n_sh").as("nb")),
        Seq("doc_b")),
      threshold)
  }

  /** Prefix-filtered n-gram Jaccard — the lossless scale path for
    * similarity self-joins (Chaudhuri et al.'s prefix filtering, public
    * SSJoin literature): under a global shingle order, two sets with
    * Jaccard >= t must share a shingle inside each one's
    * (n - ceil(t*n) + 1)-prefix (since J >= t implies overlap >= t*n for
    * both sizes). Ordering by ascending document frequency puts the
    * RAREST shingles in the prefix, so the candidate join never touches
    * the stop-shingle buckets that make the naive self-join quadratic on
    * heavy-tailed corpora. Candidates are then verified exactly.
    *
    * Output is identical to `ngramJaccardPairs` (spec-checked); cost is
    * prefix-join + |candidates| x set-intersection instead of a full
    * shingle self-join. */
  def ngramJaccardPairsPrefix(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sh = scope.retain(shingleTable(docs, idCol, textCol, n))
    // document frequency via groupBy + join-back (partial aggregation
    // collapses the df table to |vocabulary| before the join)
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // one row per document holding its shingle set ordered by ascending
    // (df, shingle): in-row sort_array replaces a row_number window (no
    // per-doc sort shuffle), and the array is reused for both the prefix
    // slice and the exact verification. A document's shingle set is
    // bounded by document length, so the row stays small at any corpus
    // scale.
    val docsets = scope.retain(sh.join(df, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
        .as("ranked"))
      .select(col(idCol),
        transform(col("ranked"), r => r.getField("shingle")).as("shingles"),
        size(col("ranked")).as("n_sh")))
    scoreJaccard(verifyCandidates(
      ppjoinCandidates(prefixLeg(docsets, idCol, threshold, "a"),
        prefixLeg(docsets, idCol, threshold, "b"), threshold,
        col("doc_a") < col("doc_b")),
      docsets, docsets, idCol), threshold)
  }

  /** One PPJoin prefix leg over a (id, shingles, n_sh) docset table:
    * prefix length p = n_sh - ceil(t*n_sh) + 1 under the table's global
    * shingle order, with the 1-based prefix position kept for the
    * positional filter. */
  private def prefixLeg(docsets: DataFrame, idCol: String,
      threshold: Double, side: String): DataFrame =
    docsets.select(col(idCol).as(s"doc_$side"), col("n_sh").as(s"n$side"),
      posexplode(slice(col("shingles"), lit(1),
        (col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1).cast("int")))
        .as(Seq("pos0", "shingle")))
      .withColumn(s"p$side", col("pos0") + 1).drop("pos0")

  /** Candidate join with PPJoin pruning (Xiao et al., public SSJoin
    * literature), both filters evaluated inside the codegen join output
    * stream:
    *  - length filter: J >= t forces t*na <= nb (and symmetrically)
    *  - positional filter: overlap is at most 1 + min(remaining suffix
    *    on each side), which must reach ceil(t/(1+t)*(na+nb))
    * Both legs MUST share one global shingle order or the pruning is
    * lossy. */
  private def ppjoinCandidates(a: DataFrame, b: DataFrame,
      threshold: Double,
      pairFilter: org.apache.spark.sql.Column): DataFrame = {
    val reqOverlap = ceil(lit(threshold / (1 + threshold)) *
      (col("na") + col("nb")))
    a.join(b, Seq("shingle"))
      .filter(pairFilter)
      .filter(col("nb") >= ceil(lit(threshold) * col("na")) &&
        col("na") >= ceil(lit(threshold) * col("nb")))
      .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
        >= reqOverlap)
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .distinct()
  }

  /** Exact verification in-row: intersection of the two shingle arrays
    * (candidate-pair shuffle with bounded array payloads — never the
    * candidate x shingle expansion). */
  private def verifyCandidates(cands: DataFrame, aSets: DataFrame,
      bSets: DataFrame, idCol: String): DataFrame =
    cands
      .join(aSets.select(col(idCol).as("doc_a"), col("shingles").as("sa")),
        Seq("doc_a"))
      .join(bSets.select(col(idCol).as("doc_b"), col("shingles").as("sb")),
        Seq("doc_b"))
      .withColumn("inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"), col("inter"))

  /** Hash-ordered document shingle sets — the persistable artifact for
    * INCREMENTAL prefix-filtered Jaccard: (id, shingles ascending by
    * md5(shingle), n_sh). The md5 order is FIXED and corpus-independent,
    * so prefixes computed today remain a valid global order as the
    * stored table grows across ingests — unlike
    * [[ngramJaccardPairsPrefix]]'s df-ranked order, which is a per-run
    * pruning heuristic that would go stale (and lossy) between runs. */
  def docShingleSets(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    shingleTable(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(md5(col("shingle")).as("h"),
        col("shingle").as("shingle")))).as("ranked"))
      .select(col(idCol),
        transform(col("ranked"), r => r.getField("shingle")).as("shingles"),
        size(col("ranked")).as("n_sh"))

  /** Incremental prefix-filtered n-gram Jaccard — the continuous-ingest
    * scale path: a NEW batch against an EXISTING [[docShingleSets]]
    * table (append the batch's sets after each call), plus pairs within
    * the batch. The shared md5 shingle order makes the PPJoin pruning
    * lossless across ingests, and the prefix join never touches the
    * stop-shingle buckets that make [[ngramJaccardPairsAgainst]]
    * quadratic on heavy-tailed corpora; sizes ride in the stored sets,
    * so no corpus-wide aggregation runs per batch. Same restriction
    * contract and output shape as the other incremental operators
    * (spec-pinned). */
  def ngramJaccardPairsAgainstPrefix(
      newDocs: DataFrame, corpusSets: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val newSets = scope.retain(docShingleSets(newDocs, idCol, textCol, n))
    val a = prefixLeg(newSets, idCol, threshold, "a")
    val vsCorpus = ppjoinCandidates(a,
      prefixLeg(corpusSets, idCol, threshold, "b"), threshold,
      col("doc_a") =!= col("doc_b"))
    val within = ppjoinCandidates(a,
      prefixLeg(newSets, idCol, threshold, "b"), threshold,
      col("doc_a") < col("doc_b"))
    val bSets = newSets.select(col(idCol), col("shingles"))
      .unionByName(corpusSets.select(col(idCol), col("shingles")))
    scoreJaccard(verifyCandidates(vsCorpus.unionByName(within),
      newSets, bSets, idCol), threshold)
  }

  /** Row-local SimHash Column (folds the token array in-row). Convenient
    * for ad-hoc use on short arrays; for corpus-scale hashing prefer
    * `simhashTable`, whose explode+aggregate form stays in codegen. */
  def simhash(textCol: Column): Column = {
    val ws = split(TextFunctions.collapseWs(textCol), " ")
    val bitCols = (0 until 64).map { j =>
      val votes = aggregate(
        ws, lit(0L),
        (acc: Column, w: Column) =>
          acc + (shiftright(xxhash64(w), j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** 64-bit SimHash over whitespace tokens using xxhash64 bit planes.
    *
    * Implementation: explode tokens, hash each token ONCE, then one
    * hash-aggregation with 64 conditional-sum vote counters — all inside
    * whole-stage codegen. (A per-row fold with 64 higher-order `aggregate`
    * lambdas evaluates interpreted and re-hashes every token 64 times —
    * measured ~10x slower at sf0.1.) One shuffle on the doc id.
    * Not oracle-expressible (xxhash64 is Spark-specific) — verified by
    * rows-only check + unit tests. */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs
      .select(col(idCol),
        explode(split(TextFunctions.collapseWs(col(textCol)), " ")).as("w"))
      .select(col(idCol), xxhash64(col("w")).as("h"))
    val votes = (0 until 64).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
        .as(s"v_$j")
    }
    val bits = (0 until 64).map(j =>
      when(col(s"v_$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
    tokens.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), bits.reduce(_ + _).as("sh"))
  }

  /** Engine-portable SimHash table: md5-derived bit planes, emitted as two
    * 32-bit halves (`sh_lo` = bits 0..31, `sh_hi` = bits 32..63) so every
    * value and shift stays inside signed-64 range on any engine (1L << 63
    * would wrap/overflow engine-dependently). Same explode+vote-aggregate
    * shape as `simhashTable`; md5 costs ~3x xxhash64 per token but is
    * identically computable by the DuckDB oracle, so the whole pipeline
    * (hash -> votes -> signature) is hash-verified end to end. Prefer
    * `simhashTable` when raw throughput matters more than cross-engine
    * verification. */
  def simhashTableMd5(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs
      .select(col(idCol),
        explode(split(TextFunctions.collapseWs(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col(idCol), md5(col("w")).as("m"))
      .select(col(idCol),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("h2"))
    val votes = (0 until 32).flatMap { j =>
      Seq(
        sum(shiftright(col("h1"), j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
          .as(s"v1_$j"),
        sum(shiftright(col("h2"), j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
          .as(s"v2_$j"))
    }
    val lo = (0 until 32).map(j =>
      when(col(s"v1_$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val hi = (0 until 32).map(j =>
      when(col(s"v2_$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_ + _)
    tokens.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), lo.as("sh_lo"), hi.as("sh_hi"))
  }

  /** (doc_<side>, lo/hi_<side>, band_idx, band_val) — one join leg of the
    * 4 x 16-bit band self-join over split md5-simhash signatures. */
  private def simhashBandsMd5(
      hashed: DataFrame, idCol: String, side: String): DataFrame = {
    val bandVals = Seq(
      col("sh_lo").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("sh_lo"), 16).bitwiseAND(lit(0xFFFFL)),
      col("sh_hi").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("sh_hi"), 16).bitwiseAND(lit(0xFFFFL)))
    hashed.select(col(idCol).as(s"doc_$side"), col("sh_lo").as(s"lo_$side"),
      col("sh_hi").as(s"hi_$side"),
      posexplode(array(bandVals: _*)).as(Seq("band_idx", "band_val")))
  }

  /** Pair dedup (a candidate sharing several bands appears once) + exact
    * split-signature hamming verification. */
  private def hammingVerifyMd5(cand: DataFrame, maxHamming: Int): DataFrame =
    cand
      .select(col("doc_a"), col("doc_b"), col("lo_a"), col("hi_a"),
        col("lo_b"), col("hi_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
        bit_count(col("hi_a").bitwiseXOR(col("hi_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))

  /** Near-dup pairs over `simhashTableMd5` signatures: 4 x 16-bit bands in
    * one posexplode join, exact hamming verification on candidates. Output
    * contract matches `simhashPairs` (doc_a, doc_b, hamming). */
  def simhashPairsMd5(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, scope: CacheScope = CacheScope.session): DataFrame = {
    val hashed = scope.retain(simhashTableMd5(docs, idCol, textCol))
    hammingVerifyMd5(
      simhashBandsMd5(hashed, idCol, "a")
        .join(simhashBandsMd5(hashed, idCol, "b"), Seq("band_idx", "band_val"))
        .filter(col("doc_a") < col("doc_b")),
      maxHamming)
  }

  /** Incremental SimHash near-dup pairs: a NEW batch of documents against
    * an EXISTING signature table (from [[simhashTableMd5]], typically a
    * parquet table maintained across runs — append the new batch's
    * signatures after each call), plus pairs within the batch. Only the
    * increment is tokenized and hashed; the corpus is touched through the
    * 16-bit band join alone — the same continuous-ingest shape as
    * [[minhashCandidatesAgainst]] and the incremental hyperplane-LSH
    * paths. With ids disjoint between batch and corpus, the result is
    * exactly [[simhashPairsMd5]] over (corpus + batch) restricted to
    * pairs touching a new document (spec-pinned). Output: (doc_a = new
    * id, doc_b = matched id, hamming); batch-internal pairs a < b. */
  def simhashPairsMd5Against(
      newDocs: DataFrame, corpusHashes: DataFrame, idCol: String,
      textCol: String, maxHamming: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val newHashes = scope.retain(simhashTableMd5(newDocs, idCol, textCol))
    val n = simhashBandsMd5(newHashes, idCol, "a")
    val vsCorpus = n
      .join(simhashBandsMd5(corpusHashes, idCol, "b"),
        Seq("band_idx", "band_val"))
      .filter(col("doc_a") =!= col("doc_b"))
    val within = n
      .join(simhashBandsMd5(newHashes, idCol, "b"),
        Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
    hammingVerifyMd5(vsCorpus.unionByName(within), maxHamming)
  }

  /** SimHash near-dup candidates: band the 64-bit hash into 4 x 16-bit
    * keys (docs within small hamming distance share >= 1 exact band with
    * high probability), then verify hamming distance on candidates.
    * Signatures are persisted before the self-join so the hash pass runs
    * once, and the 4 bands join in a single (band_idx, band_value) join
    * rather than 4 separate shuffles. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, scope: CacheScope = CacheScope.session): DataFrame = {
    val hashed = scope.retain(simhashTable(docs, idCol, textCol))
    val banded = hashed.select(col(idCol), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_idx", "band_val")))
    val l = banded.select(col(idCol).as("doc_a"), col("sh").as("sh_a"),
      col("band_idx"), col("band_val"))
    val r = banded.select(col(idCol).as("doc_b"), col("sh").as("sh_b"),
      col("band_idx"), col("band_val"))
    l.join(r, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
