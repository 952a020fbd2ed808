package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** Edit-distance (Levenshtein) similarity join with lossless q-gram
  * prefix pruning — the entity-resolution / record-linkage staple
  * (fuzzy key matching across government registries is the reference's
  * own problem domain; the algorithmic shape is ED-Join, Xiao et al.,
  * VLDB'08, re-expressed relationally).
  *
  * Pruning chain, every step lossless for distance <= d with q-grams:
  *  1. LENGTH: |len(a) - len(b)| <= d (each edit changes length by <= 1).
  *  2. PREFIX: one edit disturbs at most q distinct q-grams, so a
  *     qualifying pair's distinct-gram sets satisfy |A \ B| <= d*q; by
  *     the standard prefix-filter lemma the (d*q + 1)-prefixes of A and
  *     B under ONE global gram order must intersect whenever
  *     max(|A|,|B|) > d*q. The order is ascending (document frequency,
  *     gram) — rarest grams first, computed over the corpus (for
  *     [[bestMatch]], over the UNION of both sides: the lemma needs one
  *     shared total order), the same choice as
  *     [[graft.dedup.Dedup.ngramJaccardPairsPrefix]]. The candidate
  *     join therefore never touches the stop-gram buckets that make a
  *     shared-gram join quadratic on common substrings.
  *  3. VERIFY: banded levenshtein with the built-in threshold form
  *     (O(d * len) per candidate, codegen'd).
  *
  * Pairs where BOTH sides have <= d*q grams (strings shorter than
  * q + d*q chars) carry no prefix guarantee; they are routed through a
  * dedicated short-string bucket joined all-pairs. That bucket is
  * bounded by the alphabet (strings under ~q(d+1) chars), so the one
  * cross join in the plan is over a filtered, tiny input — the
  * corpus-sized path is the gram equi-join.
  *
  * Shape at scale: grams are derived in-row; the df table collapses to
  * |distinct grams| via partial aggregation before the join-back; the
  * candidate join shuffles (gram, id, string) for the d*q + 1 rarest
  * grams per string only — never the full gram table, never a cross
  * product. Candidates dedup on the pair key before the verify, so a
  * pair sharing several prefix grams verifies once.
  */
object FuzzyJoin {

  /** In-row distinct q-grams of `strCol` (empty array when the string is
    * shorter than q; NULL propagates). */
  private[operators] def qgrams(strCol: Column, q: Int): Column =
    when(strCol.isNull, lit(null).cast("array<string>"))
      .when(length(strCol) < q, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(strCol) - (q - 1)),
        i => strCol.substr(i, lit(q)))))

  /** (id, s, len, grams, gramCount) — the retained per-string table. */
  private def gramBase(df: DataFrame, idCol: String, strCol: String,
      q: Int, scope: CacheScope): DataFrame =
    scope.retain(df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__len", length(col("__s")))
      .withColumn("__grams", qgrams(col("__s"), q))
      .withColumn("__n", size(col("__grams"))))

  /** The df-rarest `pfxLen` grams per string, exploded:
    * (__id, __len, __g) — ids and lengths only, so the candidate join
    * shuffles narrow rows; strings are joined back by key for the
    * DISTINCT survivors alone. `dfTable` supplies the shared global
    * order. */
  private def prefixLeg(base: DataFrame, dfTable: DataFrame,
      pfxLen: Int): DataFrame =
    base.select(col("__id"), col("__len"),
        explode(col("__grams")).as("__g"))
      .join(dfTable, Seq("__g"))
      .groupBy(col("__id"), col("__len"))
      .agg(sort_array(collect_list(struct(col("__df"), col("__g"))))
        .as("__ranked"))
      .select(col("__id"), col("__len"),
        explode(transform(slice(col("__ranked"), 1, pfxLen),
          r => r.getField("__g"))).as("__g"))

  private def gramDf(bases: Seq[DataFrame]): DataFrame =
    bases.map(_.select(explode(col("__grams")).as("__g")))
      .reduce(_.unionByName(_))
      .groupBy(col("__g")).agg(count(lit(1)).as("__df"))

  // ------------------------------------------------ deletion neighborhood
  /** All single-character deletions of `c` (length-n string -> n
    * variants); the empty string has none. */
  private def deletions(c: Column): Column =
    transform(sequence(lit(1), length(c)),
      i => concat(c.substr(lit(1), i - 1),
        c.substr(i + 1, length(c) - i)))

  /** FastSS / SymSpell-style deletion-neighborhood edit-distance
    * self-join (Bocek et al., "Fast Similarity Search in Large
    * Dictionaries", 2007; public algorithm): two strings within edit
    * distance d share at least one member of their ≤d-deletion
    * neighborhoods, so exact candidates come from an EQUI-JOIN on
    * md5(variant) — no gram statistics, no prefix selection.
    *
    * Why it exists alongside [[editDistancePairs]]: the q-gram prefix
    * screen is lossless but its candidate volume is governed by the
    * hottest selected gram — on low-entropy corpora (keys sharing a
    * long common stem, e.g. zero-padded sequential ids) even each
    * string's RAREST grams are shared by thousands of strings, and the
    * prefix join degenerates toward all-pairs inside those buckets
    * (measured: 10× data → >30× runtime in ScaleCheck). Deletion
    * variants, by contrast, pin every remaining character, so a bucket
    * holds only strings genuinely one edit apart at that position —
    * bucket sizes stay bounded by true-neighbor counts on ANY corpus.
    * Cost: ~n variants per string for d=1 (~n²/2 for d=2) versus
    * d·q+1 prefix grams — a constant-factor row-count trade for
    * worst-case-proof buckets. Use it for small d on short key-like
    * strings; the prefix path remains better for long texts where n is
    * large and grams are diverse.
    *
    * d = 1 runs the POSITION-KEYED refinement ([[positionedPairs1]]):
    * keying each deletion variant by its deletion position makes the
    * screen EXACT — same-position variants equal ⟺ the strings differ
    * by one substitution; a depth-1 variant equal to the other string
    * itself ⟺ one indel — so the candidate set IS the answer set and
    * zero false pairs reach the verify expression. On low-entropy keys
    * the unpositioned join's dominant cost is exactly the ed-2
    * shift-pair mass (delete position i in one string, j≠i in the
    * other, e.g. digit rotations through runs of zeros), which the
    * position key structurally excludes.
    *
    * Exactness: candidates are a superset (d=1: exactly the answer
    * set) and the banded levenshtein verify keeps only true pairs —
    * equivalence with [[editDistancePairs]] is spec-pinned.
    * d ∈ {1, 2}. Output: (id_a, id_b, dist), id_a < id_b; NULL strings
    * never match. */
  def deletionPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, scope: CacheScope = CacheScope.session): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion neighborhoods are practical for d in {1, 2}, got $maxDist")
    val base = scope.retain(df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__len", length(col("__s"))))
    val cands =
      if (maxDist == 1) {
        val (k0, k1) = positionedKeys(base)
        positionedPairs1(k0, k1, k0, k1, selfPairs = true)
      } else {
        // md5 keys: fixed-width shuffle rows regardless of string length
        val keyed = base.select(col("__id"), col("__len"),
          explode(neighborhood(maxDist)).as("__v"))
          .select(col("__id"), col("__len"), md5(col("__v")).as("__k"))
        keyed.select(col("__id").as("id_a"),
            col("__len").as("__la"), col("__k"))
          .join(keyed.select(col("__id").as("id_b"),
            col("__len").as("__lb"), col("__k")), Seq("__k"))
          .filter(col("id_a") < col("id_b") &&
            abs(col("__la") - col("__lb")) <= maxDist)
          .select(col("id_a"), col("id_b"))
      }
    cands
      .distinct() // verify each surviving pair once
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")),
        Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")),
        Seq("id_b"))
      .withColumn("__dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("__dist") =!= -1)
      .select(col("id_a"), col("id_b"),
        col("__dist").cast("long").as("dist"))
  }

  /** Depth-0 (the string itself) and position-keyed depth-1 deletion
    * rows for one side: (__id, __len, __k) and (__id, __len, __i, __k). */
  private def positionedKeys(base: DataFrame): (DataFrame, DataFrame) = {
    val k0 = base.select(col("__id"), col("__len"), md5(col("__s")).as("__k"))
    val k1 = base
      .select(col("__id"), col("__len"),
        posexplode(deletions(col("__s"))).as(Seq("__i", "__v")))
      .select(col("__id"), col("__len"), col("__i"), md5(col("__v")).as("__k"))
    (k0, k1)
  }

  /** The exact d=1 candidate legs over position-keyed variants — every
    * emitted pair is a true ed ≤ 1 pair (modulo md5 collisions, which
    * the verify would catch):
    *  - SUB leg: depth-1 ⋈ depth-1 on (variant, position), equal
    *    lengths — deleting the SAME position from both yields equality
    *    iff the strings agree everywhere else (one substitution, or
    *    identical strings).
    *  - INDEL legs: depth-1 of the longer side ⋈ depth-0 of the
    *    shorter — the shorter string IS a deletion variant of the
    *    longer iff they are one insertion/deletion apart.
    *  - DUP leg: depth-0 ⋈ depth-0 — identical strings (dist 0),
    *    needed because empty strings have no deletions.
    * `selfPairs` orients output as id_a < id_b (self-join); otherwise
    * pairs keep (left, right) roles and all four directions emit. */
  private def positionedPairs1(l0: DataFrame, l1: DataFrame,
      r0: DataFrame, r1: DataFrame, selfPairs: Boolean): DataFrame = {
    def side(df: DataFrame, suf: String, cols: String*) =
      df.select((Seq("__id", "__len") ++ cols)
        .map(c => col(c).as(s"${c}_$suf")): _*)
    def pair(a: Column, b: Column) =
      if (selfPairs) Seq(least(a, b).as("id_a"), greatest(a, b).as("id_b"))
      else Seq(a.as("id_a"), b.as("id_b"))
    val sub = l1.select(col("__id").as("id_a"), col("__len").as("__la"),
        col("__i"), col("__k"))
      .join(r1.select(col("__id").as("id_b"), col("__len").as("__lb"),
        col("__i"), col("__k")), Seq("__k", "__i"))
      .filter(col("__la") === col("__lb") &&
        (if (selfPairs) col("id_a") < col("id_b") else lit(true)))
      .select(col("id_a"), col("id_b"))
    val delL = side(l1, "a", "__k")
      .join(side(r0, "b", "__k"),
        col("__k_a") === col("__k_b") &&
          col("__len_a") === col("__len_b") + 1)
      .select(pair(col("__id_a"), col("__id_b")): _*)
    val delR = side(l0, "a", "__k")
      .join(side(r1, "b", "__k"),
        col("__k_a") === col("__k_b") &&
          col("__len_b") === col("__len_a") + 1)
      .select(pair(col("__id_a"), col("__id_b")): _*)
    val dup = side(l0, "a", "__k")
      .join(side(r0, "b", "__k"), col("__k_a") === col("__k_b") &&
        (if (selfPairs) col("__id_a") < col("__id_b") else lit(true)))
      .select(pair(col("__id_a"), col("__id_b")): _*)
    if (selfPairs)
      // the two indel directions are mirrors of one join — emit one
      sub.union(delL).union(dup)
    else sub.union(delL).union(delR).union(dup)
  }

  /** ≤`maxDist`-deletion neighborhood of `__s` (incl. the string
    * itself), distinct. */
  private def neighborhood(maxDist: Int): Column = {
    val nb1 = concat(array(col("__s")), deletions(col("__s")))
    if (maxDist == 1) array_distinct(nb1)
    else array_distinct(concat(nb1,
      flatten(transform(deletions(col("__s")), d => deletions(d)))))
  }

  /** Persistable deletion-variant screen table: (id, len, __k) — one
    * row per ≤`maxDist`-deletion variant, md5-keyed. Maintain it across
    * runs (append each ingested batch's variants) and incremental
    * matching joins new batches against it instead of re-deriving the
    * corpus — the same continuous-ingest shape as
    * [[graft.dedup.Dedup.bandTable]]. */
  def deletionVariants(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion neighborhoods are practical for d in {1, 2}, got $maxDist")
    df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__len", length(col("__s")))
      .select(col("__id"), col("__len"),
        explode(neighborhood(maxDist)).as("__v"))
      .select(col("__id"), col("__len"), md5(col("__v")).as("__k"))
  }

  /** Incremental deletion-neighborhood matching: a NEW batch of strings
    * against an EXISTING variant table (from [[deletionVariants]],
    * typically parquet maintained across runs — append the new batch's
    * variants after each call), plus pairs within the batch. Only the
    * increment derives variants; the corpus is touched through the
    * md5-key equi-join alone (strings re-join by id for the verified
    * survivors) — the continuous-ingest shape of the other five
    * incremental screens. With ids disjoint between batch and corpus,
    * the result is exactly [[deletionPairs]] over (corpus + batch)
    * restricted to pairs touching a new id (spec-pinned). Output:
    * (id_a = new id, id_b = matched id, dist); batch-internal pairs
    * a < b. */
  def deletionPairsAgainst(newDocs: DataFrame, corpus: DataFrame,
      corpusVariants: DataFrame, idCol: String, strCol: String,
      maxDist: Int, scope: CacheScope = CacheScope.session): DataFrame = {
    val newVars = scope.retain(deletionVariants(newDocs, idCol, strCol, maxDist))
    val n = newVars.select(col("__id").as("id_a"),
      col("__len").as("__la"), col("__k"))
    val vsCorpus = n
      .join(corpusVariants.select(col("__id").as("id_b"),
        col("__len").as("__lb"), col("__k")), Seq("__k"))
      .filter(col("id_a") =!= col("id_b"))
    val within = n
      .join(newVars.select(col("__id").as("id_b"),
        col("__len").as("__lb"), col("__k")), Seq("__k"))
      .filter(col("id_a") < col("id_b"))
    val strings = corpus.unionByName(newDocs)
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
    vsCorpus.unionByName(within)
      .filter(abs(col("__la") - col("__lb")) <= maxDist)
      .select(col("id_a"), col("id_b"))
      .distinct()
      .join(strings.select(col("__id").as("id_a"), col("__s").as("__sa")),
        Seq("id_a"))
      .join(strings.select(col("__id").as("id_b"), col("__s").as("__sb")),
        Seq("id_b"))
      .withColumn("__dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("__dist") =!= -1)
      .select(col("id_a"), col("id_b"),
        col("__dist").cast("long").as("dist"))
  }

  /** Two-table [[deletionPairs]]: all (left, right) pairs within
    * `maxDist` edits via the deletion-variant equi-join. Output:
    * (id_l, id_r, dist). Same corpus-shape rationale as the self-join
    * form — use for key-like strings where prefix-gram screens can go
    * hot; equivalence with [[editDistanceJoin]] is spec-pinned. */
  def deletionJoin(left: DataFrame, right: DataFrame, leftId: String,
      rightId: String, strCol: String, maxDist: Int,
      scope: CacheScope = CacheScope.session): DataFrame =
    deletionScored(left, right, leftId, rightId, strCol, maxDist, scope)
      .select(col("id_l"), col("id_r"),
        col("__dist").cast("long").as("dist"))

  /** [[bestMatch]] through the deletion-neighborhood screen: each left
    * row's closest right row within `maxDist` edits, ties broken by
    * smallest right id. Identical contract to [[bestMatch]]
    * (spec-pinned); the screen choice is the only difference. */
  def bestMatchDeletion(left: DataFrame, right: DataFrame, leftId: String,
      rightId: String, strCol: String, maxDist: Int,
      scope: CacheScope = CacheScope.session): DataFrame =
    deletionScored(left, right, leftId, rightId, strCol, maxDist, scope)
      .groupBy(col("id_l"))
      .agg(min(struct(col("__dist"), col("id_r"))).as("__best"))
      .select(col("id_l"), col("__best")("id_r").as("id_r"),
        col("__best")("__dist").cast("long").as("dist"))

  private def deletionScored(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String, strCol: String, maxDist: Int,
      scope: CacheScope): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion neighborhoods are practical for d in {1, 2}, got $maxDist")
    def sideBase(df: DataFrame, idCol: String) = scope.retain(df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__len", length(col("__s"))))
    val lBase = sideBase(left, leftId)
    val rBase = sideBase(right, rightId)
    val cands =
      if (maxDist == 1) {
        // position-keyed exact legs (see deletionPairs): (id_a, id_b)
        // carry the (left, right) roles here
        val (l0, l1) = positionedKeys(lBase)
        val (r0, r1) = positionedKeys(rBase)
        positionedPairs1(l0, l1, r0, r1, selfPairs = false)
          .select(col("id_a").as("id_l"), col("id_b").as("id_r"))
      } else {
        def keyed(base: DataFrame, idAs: String) = base
          .select(col("__id").as(idAs), col("__len").as(s"__len_$idAs"),
            explode(neighborhood(maxDist)).as("__v"))
          .select(col(idAs), col(s"__len_$idAs"), md5(col("__v")).as("__k"))
        keyed(lBase, "id_l").join(keyed(rBase, "id_r"), Seq("__k"))
          .filter(abs(col("__len_id_l") - col("__len_id_r")) <= maxDist)
          .select(col("id_l"), col("id_r"))
      }
    cands
      .distinct()
      .join(lBase.select(col("__id").as("id_l"), col("__s").as("__sl")),
        Seq("id_l"))
      .join(rBase.select(col("__id").as("id_r"), col("__s").as("__sr")),
        Seq("id_r"))
      .withColumn("__dist", levenshtein(col("__sl"), col("__sr"), maxDist))
      .filter(col("__dist") =!= -1)
  }

  /** All pairs within `maxDist` edits: (id_a, id_b, dist), id_a < id_b.
    * NULL strings never match. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2,
      scope: CacheScope = CacheScope.session): DataFrame =
    selfCandidates(df, idCol, strCol, maxDist, q, scope)
      .withColumn("__dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("__dist") =!= -1)
      .select(col("id_a"), col("id_b"),
        col("__dist").cast("long").as("dist"))

  /** The deduped candidate pairs the verify stage sees — exposed to the
    * spec so the screen's selectivity is asserted, not just claimed. */
  private[operators] def selfCandidates(df: DataFrame, idCol: String,
      strCol: String, maxDist: Int, q: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val pfxLen = maxDist * q + 1
    val base = gramBase(df, idCol, strCol, q, scope)
    val pfx = scope.retain(prefixLeg(base, gramDf(Seq(base)), pfxLen))
    val viaPrefix = pfx.select(col("__id").as("id_a"),
        col("__len").as("__la"), col("__g"))
      .join(pfx.select(col("__id").as("id_b"), col("__len").as("__lb"),
        col("__g")), Seq("__g"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .select(col("id_a"), col("id_b"))
    // both-short pairs have no prefix guarantee: all-pairs over the
    // bounded short bucket (strings under q + d*q chars)
    val short = base.filter(col("__n") <= maxDist * q)
    val viaShort = short.select(col("__id").as("id_a"), col("__len").as("__la"))
      .crossJoin(short.select(col("__id").as("id_b"), col("__len").as("__lb")))
      .filter(col("id_a") < col("id_b") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .select(col("id_a"), col("id_b"))
    viaPrefix.union(viaShort)
      .distinct() // a pair sharing several prefix grams verifies ONCE
      // strings re-join by key for the SURVIVORS only
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")),
        Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")),
        Seq("id_b"))
      .select(col("id_a"), col("__sa"), col("id_b"), col("__sb"))
  }

  /** All (left, right) pairs within `maxDist` edits:
    * (id_l, id_r, dist). The two-table block form — feeds downstream
    * rescoring (e.g. Jaro-Winkler ranking) or [[bestMatch]]. */
  def editDistanceJoin(left: DataFrame, right: DataFrame, leftId: String,
      rightId: String, strCol: String, maxDist: Int, q: Int = 2,
      scope: CacheScope = CacheScope.session): DataFrame =
    crossScored(left, right, leftId, rightId, strCol, maxDist, q, scope)
      .select(col("id_l"), col("id_r"),
        col("__dist").cast("long").as("dist"))

  /** Each left row's best match on the right within `maxDist` edits:
    * (id_l, id_r, dist), ties broken by smallest right id
    * (deterministic). Left rows with no match are absent. The "match
    * incoming records against a master table" form. */
  def bestMatch(left: DataFrame, right: DataFrame, leftId: String,
      rightId: String, strCol: String, maxDist: Int, q: Int = 2,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val scored = crossScored(left, right, leftId, rightId, strCol,
      maxDist, q, scope)
    // bounded per-left argmin: min over (dist, right id) structs — no
    // window over the candidate fan-out
    scored.groupBy(col("id_l"))
      .agg(min(struct(col("__dist"), col("id_r"))).as("__best"))
      .select(col("id_l"), col("__best")("id_r").as("id_r"),
        col("__best")("__dist").cast("long").as("dist"))
  }

  /** Verified two-table candidates: (id_l, id_r, __dist). */
  private def crossScored(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String, strCol: String, maxDist: Int,
      q: Int, scope: CacheScope): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val pfxLen = maxDist * q + 1
    val l = gramBase(left, leftId, strCol, q, scope)
    val r = gramBase(right, rightId, strCol, q, scope)
    // ONE order for both sides — df over the union
    val dfTable = gramDf(Seq(l, r))
    val viaPrefix = prefixLeg(l, dfTable, pfxLen)
      .select(col("__id").as("id_l"), col("__len").as("__ll"), col("__g"))
      .join(prefixLeg(r, dfTable, pfxLen)
        .select(col("__id").as("id_r"), col("__len").as("__lr"),
          col("__g")),
        Seq("__g"))
      .filter(abs(col("__ll") - col("__lr")) <= maxDist)
      .select(col("id_l"), col("id_r"))
    val viaShort = l.filter(col("__n") <= maxDist * q)
      .select(col("__id").as("id_l"), col("__len").as("__ll"))
      .crossJoin(r.filter(col("__n") <= maxDist * q)
        .select(col("__id").as("id_r"), col("__len").as("__lr")))
      .filter(abs(col("__ll") - col("__lr")) <= maxDist)
      .select(col("id_l"), col("id_r"))
    viaPrefix.union(viaShort)
      .distinct()
      .join(l.select(col("__id").as("id_l"), col("__s").as("__sl")),
        Seq("id_l"))
      .join(r.select(col("__id").as("id_r"), col("__s").as("__sr")),
        Seq("id_r"))
      .withColumn("__dist", levenshtein(col("__sl"), col("__sr"), maxDist))
      .filter(col("__dist") =!= -1)
  }
}
