package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, Dedup}
import graft.functions.TextFunctions
import graft.similarity.CosineSearch

/** Beyond-reference query group: text analysis, deduplication, similarity
  * search over `documents`/`embeddings` (the LLM-data-pipeline operators).
  *
  * The SQL oracles are generated from the same constants as the Column
  * builders so both sides stay structurally identical (same arithmetic
  * nesting => same IEEE results; md5-based hashing => engine-portable).
  */
object QueriesText {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --- SQL fragment builders mirroring TextFunctions -----------------
  // (private[graft]: QueriesExtra's composite queries reuse them)
  private[graft] def sqlCollapse(x: String) =
    s"trim(regexp_replace($x, '\\s+', ' ', 'g'))"
  private[graft] def sqlTokens(s: String) =
    s"CASE WHEN $s = '' THEN 0 ELSE length($s) - length(replace($s, ' ', '')) + 1 END"
  private def sqlOcc(p: String, m: String) =
    s"((length($p) - length(replace($p, '$m', ''))) / ${m.length})"
  private[graft] def sqlLangScore(p: String, ms: Seq[String]) =
    ms.map(m => sqlOcc(p, m)).mkString(" + ")

  /** TextFunctions.qualityScore over pre-computed column names (the
    * collapsed text `s`, token count, stopword hits) — identical
    * arithmetic shape on both engines. */
  private[graft] def sqlQuality(s: String, nTokens: String,
      stopHits: String): String =
    s"""CASE WHEN $s IS NULL THEN NULL ELSE
       |  least(1.0, CAST($nTokens AS DOUBLE) / 50.0) * 0.4 +
       |  least(1.0, ($stopHits / (CAST($nTokens AS DOUBLE) + 1.0)) * 5.0) * 0.3 +
       |  CASE WHEN ((length($s) - ($nTokens - 1)) * 1.0 / (CAST($nTokens AS DOUBLE) + 1.0))
       |            BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END END""".stripMargin

  /** The quality-score CTE chain over a text expression: emits CTEs
    * `sw`/`tokw` ending in `qw` = (doc_id, <carryCols>, n_tokens, qual).
    * Shared by q_weighted_sample, the curation-pipeline composite, and
    * the profiling oracles so the score arithmetic (and the stop-marker
    * list) exists once per side. */
  private[graft] def sqlQualityCtes(sourceRel: String, textExpr: String,
      carryCols: Seq[String]): String = {
    val carry = (Seq("doc_id") ++ carryCols).mkString(", ")
    s"""sw AS (SELECT $carry, ${sqlCollapse(textExpr)} AS s,
       |         ${sqlCollapse(s"lower($textExpr)")} AS sl FROM $sourceRel),
       |tokw AS (SELECT $carry, s, ${sqlTokens("s")} AS n_tokens,
       |        ${sqlLangScore("(' ' || sl || ' ')", TextFunctions.QualityStopMarkers)} AS stop_hits
       |        FROM sw),
       |qw AS (SELECT $carry, n_tokens,
       |  ${sqlQuality("s", "n_tokens", "stop_hits")} AS qual
       |  FROM tokw)""".stripMargin
  }

  /** Sampling.hashBucket as a DuckDB fold: first 6 md5 hex chars of the
    * key to BIGINT (pure-SQL hex fold, engine-portable). */
  private[graft] def sqlHexFold(key: String): String =
    s"list_reduce(list_transform(regexp_split_to_array(" +
      s"substr(md5(CAST($key AS VARCHAR)), 1, 6), ''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
      "(a, x) -> a * 16 + x)"

  // ----------------------------------------------------------- text stats
  def qTextStats(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val c = col("text")
    docs.select(
      col("doc_id"),
      TextFunctions.tokenCount(c).as("n_tokens"),
      length(TextFunctions.collapseWs(c)).as("n_chars_norm"),
      TextFunctions.langScore(lower(c), TextFunctions.QualityStopMarkers)
        .as("stop_hits"),
      TextFunctions.punctRatio(c).as("punct_ratio"),
      TextFunctions.qualityScore(c).as("quality"))
  }

  val qTextStatsSql: String = {
    val s0 = sqlCollapse("text")
    val sl = sqlCollapse("lower(text)")
    val p = s"' ' || sl || ' '"
    s"""WITH c AS (SELECT doc_id, $s0 AS s, $sl AS sl FROM documents),
       |tok AS (SELECT doc_id, s, sl, ${sqlTokens("s")} AS n_tokens,
       |        ${sqlLangScore("(' ' || sl || ' ')", TextFunctions.QualityStopMarkers)} AS stop_hits
       |        FROM c)
       |SELECT doc_id, n_tokens, length(s) AS n_chars_norm, stop_hits,
       |  CASE WHEN length(s) = 0 THEN 0.0
       |       ELSE CAST(length(s) - length(translate(s, '.,;:!?"''()-', '')) AS DOUBLE)
       |            / CAST(length(s) AS DOUBLE) END AS punct_ratio,
       |  ${sqlQuality("s", "n_tokens", "stop_hits")} AS quality
       |FROM tok""".stripMargin
  }

  // -------------------------------------------------------------- lang id
  def qLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), col("lang").as("lang_label"),
      TextFunctions.langId(col("text")).as("lang_pred"))

  val qLangIdSql: String = {
    val scoreCols = TextFunctions.LangMarkers.map { case (lang, ms) =>
      s"${sqlLangScore("p", ms)} AS s_$lang"
    }.mkString(",\n        ")
    val langs = TextFunctions.LangMarkers.map(_._1)
    val greatest = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val arms = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH c AS (SELECT doc_id, lang,
       |        ' ' || ${sqlCollapse("lower(text)")} || ' ' AS p FROM documents),
       |sc AS (SELECT doc_id, lang, $scoreCols FROM c),
       |mx AS (SELECT *, $greatest AS m FROM sc)
       |SELECT doc_id, lang AS lang_label,
       |  CASE WHEN m <= 0 THEN 'und' $arms END AS lang_pred
       |FROM mx""".stripMargin
  }

  // ---------------------------------------------------------- fingerprint
  def qFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.fingerprintShort(col("text")).as("fp64"))

  val qFingerprintSql: String =
    s"""SELECT doc_id, md5(lower(${sqlCollapse("text")})) AS fp,
       |  substr(md5(lower(${sqlCollapse("text")})), 1, 16) AS fp64
       |FROM documents""".stripMargin

  // ---------------------------------------------------------- exact dedup
  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")

  val qDedupExactSql: String =
    s"""SELECT md5(lower(${sqlCollapse("text")})) AS content_key,
       |  min(doc_id) AS keeper_id, count(*) AS n_docs
       |FROM documents GROUP BY 1""".stripMargin

  // ------------------------------------------------------- shingle CTE(s)
  private val shingleCte =
    s"""w AS (SELECT doc_id, regexp_split_to_array(${sqlCollapse("text")}, ' ') AS ws
       |      FROM documents),
       |sw AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
       |       FROM w),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM (
       |         SELECT doc_id,
       |           w || ' ' || lead(w) OVER d || ' ' || lead(w, 2) OVER d AS shingle
       |         FROM sw WINDOW d AS (PARTITION BY doc_id ORDER BY i))
       |       WHERE shingle IS NOT NULL)""".stripMargin

  // --------------------------------------------------------- ngram dedup
  def qDedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", 3, 0.5)

  // Lossless prefix-filtered variant (the heavy-tail scale path) — same
  // output contract, so it shares the brute-force oracle.
  def qDedupNgramPrefix(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairsPrefix(t(s, dir, "documents"), "doc_id", "text", 3, 0.5)

  val qDedupNgramSql: String =
    s"""WITH $shingleCte,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, x.n AS na, y.n AS nb,
       |  CAST(inter AS DOUBLE) / CAST(x.n + y.n - inter AS DOUBLE) AS jaccard
       |FROM inter JOIN sizes x ON doc_a = x.doc_id JOIN sizes y ON doc_b = y.doc_id
       |WHERE CAST(inter AS DOUBLE) / CAST(x.n + y.n - inter AS DOUBLE) >= 0.5""".stripMargin

  // ------------------------------------------------------ minhash family
  private val MinhashK = 8
  private val BandSize = 2

  def qMinhashSig(s: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.minhashSignatures(
      Dedup.shingleTable(t(s, dir, "documents"), "doc_id", "text", 3),
      "doc_id", MinhashK)
    val bands = (0 until MinhashK / BandSize).map { b =>
      val cols = (b * BandSize until (b + 1) * BandSize).map(i => col(s"mh_$i"))
      md5(concat(cols: _*)).as(s"band_$b")
    }
    sig.select((col("doc_id") +:
      (0 until MinhashK).map(i => col(s"mh_$i"))) ++ bands: _*)
  }

  private val sigSql: String = {
    val mins = (0 until MinhashK)
      .map(i => s"min(md5('$i:' || shingle)) AS mh_$i").mkString(",\n        ")
    s"sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id)"
  }
  private val bandExprs = (0 until MinhashK / BandSize).map { b =>
    val parts = (b * BandSize until (b + 1) * BandSize).map(i => s"mh_$i")
    s"md5(${parts.mkString(" || ")}) AS band_$b"
  }

  val qMinhashSigSql: String =
    s"""WITH $shingleCte,
       |$sigSql
       |SELECT doc_id, ${(0 until MinhashK).map("mh_" + _).mkString(", ")},
       |  ${bandExprs.mkString(",\n  ")}
       |FROM sig""".stripMargin

  def qDedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.minhashSignatures(
      Dedup.shingleTable(t(s, dir, "documents"), "doc_id", "text", 3),
      "doc_id", MinhashK)
    Dedup.minhashCandidates(sig, "doc_id", MinhashK, BandSize)
  }

  val qDedupMinhashSql: String = {
    val bandCols = (0 until MinhashK / BandSize).map("band_" + _)
    val on = bandCols.map(b => s"a.$b = b.$b").mkString(" OR ")
    s"""WITH $shingleCte,
       |$sigSql,
       |banded AS (SELECT doc_id, ${bandExprs.mkString(", ")} FROM sig)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ($on)""".stripMargin
  }

  // ----------------------------------------------------- dedup clustering
  // Transitive closure of the minhash candidate pairs: pair detection
  // alone under-deletes (A~B, B~C must drop two of three docs), so the
  // cluster id = min reachable doc id is the actual dedup decision. The
  // oracle computes the same closure with a recursive CTE — a completely
  // independent algorithm (BFS fixpoint vs label propagation), so a match
  // validates the operator, not the implementation.
  def qDedupClusters(s: SparkSession, dir: String): DataFrame =
    ConnectedComponents.labels(qDedupMinhash(s, dir), "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("cluster_id"))

  val qDedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |$qDedupMinhashSql
       |),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst)
       |SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node""".stripMargin

  // ------------------------------------------------- keeper selection
  // The full dedup DECISION pipeline: minhash candidate pairs ->
  // transitive clusters -> one keeper per cluster, chosen by content
  // length (n_chars desc, doc_id tiebreak) — the curation rule that
  // keeps the richest copy rather than an arbitrary one. Output is the
  // per-document verdict for every clustered document. The oracle chains
  // the recursive-CTE closure with the same window rank.
  def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val labels = ConnectedComponents
      .labels(qDedupMinhash(s, dir), "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("cluster_id"))
    val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    labels.join(docs, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("keep"))
  }

  val qDedupKeepBestSql: String =
    s"""WITH labels AS (
       |$qDedupClustersSql
       |)
       |SELECT l.doc_id, l.cluster_id,
       |  (row_number() OVER (PARTITION BY l.cluster_id
       |     ORDER BY d.n_chars DESC, l.doc_id) = 1) AS keep
       |FROM labels l JOIN documents d USING (doc_id)""".stripMargin

  // ------------------------------------------------- deterministic sample
  // Corpus balancing: downsample over-represented strata (en to 20%, zh
  // to 50%) with hash sampling — reproducible across runs, partitionings,
  // and engines, unlike seeded per-partition RNG. The oracle replays the
  // identical md5-bucket decision.
  private[graft] val SampleBuckets = 10000

  def qSampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSample(
      t(s, dir, "documents").select(col("doc_id"), col("lang")),
      "doc_id", "lang", Map("en" -> 0.2, "zh" -> 0.5, "es" -> 0.33335),
      1.0, SampleBuckets)

  // Hashing-trick featurization: vocabulary-free signed token hashing
  // into 64 buckets — integer-exact end to end, so the oracle replays
  // bucket, sign, and sum directly.
  private val HashDims = 64

  def qFeatureHash(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.hashFeatures(
      t(s, dir, "documents"), "doc_id", "text", HashDims)

  val qFeatureHashSql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, term FROM (
       |    SELECT doc_id, unnest(ws) AS term FROM (
       |      SELECT doc_id, regexp_split_to_array(lower(${sqlCollapse("text")}), ' ') AS ws
       |      FROM documents) d)
       |  WHERE term <> '')
       |SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS weight FROM (
       |  SELECT doc_id, ${sqlHexFold("term")} % $HashDims AS bucket,
       |    CASE WHEN CAST(strpos('0123456789abcdef',
       |        substr(md5(term), 7, 1)) - 1 AS BIGINT) % 2 = 0
       |      THEN 1 ELSE -1 END AS s
       |  FROM terms)
       |GROUP BY 1, 2""".stripMargin

  // T5-style span corruption: deterministic md5 span starts, merged
  // runs, numbered sentinels — the full denoising-objective prep
  // replayed token-for-token by the oracle (string_agg ORDER BY pos on
  // the DuckDB side, order-pinned array fold on the Spark side).
  def qSpanCorrupt(s: SparkSession, dir: String): DataFrame =
    graft.operators.SpanCorrupt.corrupt(
      t(s, dir, "documents"), "doc_id", "text")

  val qSpanCorruptSql: String = {
    val foldKey = "(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR))"
    val fold =
      s"list_reduce(list_transform(regexp_split_to_array(" +
        s"substr(md5($foldKey), 1, 6), ''), " +
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
        "(a, x) -> a * 16 + x)"
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id, unnest(ws) AS tok,
       |      unnest(range(len(ws))) AS pos
       |    FROM (SELECT doc_id,
       |      regexp_split_to_array(lower(${sqlCollapse("text")}), ' ') AS ws
       |      FROM documents) d)
       |  WHERE tok <> ''),
       |flags AS (
       |  SELECT doc_id, tok, pos,
       |    CASE WHEN $fold % 20 = 0 THEN 1 ELSE 0 END AS start
       |  FROM toks),
       |m AS (
       |  SELECT doc_id, tok, pos,
       |    max(start) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS masked
       |  FROM flags),
       |o AS (
       |  SELECT doc_id, tok, pos, masked,
       |    CASE WHEN masked AND coalesce(NOT lag(masked) OVER (
       |        PARTITION BY doc_id ORDER BY pos), TRUE)
       |      THEN 1 ELSE 0 END AS opens
       |  FROM m),
       |k AS (
       |  SELECT doc_id, tok, pos, masked, opens,
       |    sum(opens) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) - 1 AS kk
       |  FROM o),
       |pieces AS (
       |  SELECT doc_id, pos, masked,
       |    CASE WHEN NOT masked THEN tok
       |         WHEN opens = 1 THEN '<extra_id_' || CAST(kk AS VARCHAR) || '>'
       |    END AS src_piece,
       |    CASE WHEN opens = 1 THEN '<extra_id_' || CAST(kk AS VARCHAR)
       |           || '> ' || tok
       |         WHEN masked THEN tok
       |    END AS tgt_piece
       |  FROM k)
       |SELECT doc_id,
       |  coalesce(string_agg(src_piece, ' ' ORDER BY pos), '') AS corrupted,
       |  coalesce(string_agg(tgt_piece, ' ' ORDER BY pos), '') AS target,
       |  count(*) AS n_tokens,
       |  CAST(count(*) FILTER (masked) AS BIGINT) AS n_masked
       |FROM pieces GROUP BY 1""".stripMargin
  }

  // Flesch reading-ease from three engine-portable regex counts (words,
  // sentence marks, vowel-group syllable proxy) and one fixed-shape
  // double formula — the readability member of the quality-signal
  // family. Zero-count docs gate to null instead of dividing by zero.
  def qReadability(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val txt = graft.functions.TextFunctions.normalize(col("text"))
    val words = size(regexp_extract_all(txt, lit("[a-z0-9']+"), lit(0)))
      .cast("long")
    val sentences = greatest(
      size(regexp_extract_all(txt, lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    val syllables = size(regexp_extract_all(txt, lit("[aeiouy]+"), lit(0)))
      .cast("long")
    docs.select(col("doc_id"), words.as("n_words"),
        sentences.as("n_sentences"), syllables.as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        when(col("n_words") > 0,
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double"))).as("flesch"))
  }

  val qReadabilitySql: String =
    s"""WITH c AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(lower(${sqlCollapse("text")}),
       |      '[a-z0-9'']+')) AS BIGINT) AS n_words,
       |    greatest(CAST(len(regexp_extract_all(lower(${sqlCollapse("text")}),
       |      '[.!?]+')) AS BIGINT), 1) AS n_sentences,
       |    CAST(len(regexp_extract_all(lower(${sqlCollapse("text")}),
       |      '[aeiouy]+')) AS BIGINT) AS n_syllables
       |  FROM documents)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  CASE WHEN n_words > 0 THEN
       |    CAST(206.835 AS DOUBLE)
       |    - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE)
       |        / CAST(n_sentences AS DOUBLE))
       |    - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE)
       |        / CAST(n_words AS DOUBLE))
       |  END AS flesch
       |FROM c""".stripMargin

  // Reciprocal rank fusion of two document rankings (length and lexical
  // diversity; the second truncated to its top 100 so the missing-item
  // zero-contribution path is exercised). Fixed-shape reciprocal sums —
  // bit-reproducible — and the full-outer alignment replayed exactly.
  def qRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val byLength = docs.select(col("doc_id"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_chars").desc, col("doc_id"))).as("r"))
    val byDiversity = docs
      .select(col("doc_id"),
        explode(split(graft.functions.TextFunctions.normalize(col("text")),
          " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("nd"))
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("nd").desc, col("doc_id"))).as("r"))
      .filter(col("r") <= 100)
    graft.operators.RankFusion.rrf(
      Seq(byLength, byDiversity), "doc_id", "r", 50)
  }

  val qRrfSql: String =
    s"""WITH a AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
       |  FROM documents),
       |terms AS (
       |  SELECT doc_id, term FROM (
       |    SELECT doc_id, unnest(ws) AS term FROM (
       |      SELECT doc_id,
       |        regexp_split_to_array(lower(${sqlCollapse("text")}), ' ') AS ws
       |      FROM documents) d)
       |  WHERE term <> ''),
       |b0 AS (
       |  SELECT doc_id, count(DISTINCT term) AS nd FROM terms GROUP BY 1),
       |b AS (
       |  SELECT doc_id, r FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY nd DESC, doc_id) AS r
       |    FROM b0) WHERE r <= 100),
       |f AS (
       |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |    (CASE WHEN a.r IS NOT NULL THEN CAST(1.0 AS DOUBLE)
       |        / (CAST(60.0 AS DOUBLE) + CAST(a.r AS DOUBLE))
       |      ELSE CAST(0.0 AS DOUBLE) END)
       |    + (CASE WHEN b.r IS NOT NULL THEN CAST(1.0 AS DOUBLE)
       |        / (CAST(60.0 AS DOUBLE) + CAST(b.r AS DOUBLE))
       |      ELSE CAST(0.0 AS DOUBLE) END) AS rrf_score
       |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
       |SELECT doc_id, rrf_score, fused_rank FROM (
       |  SELECT doc_id, rrf_score, row_number() OVER (
       |    ORDER BY rrf_score DESC, doc_id) AS fused_rank
       |  FROM f) WHERE fused_rank <= 50""".stripMargin

  // BERT-style MLM masking: 15% selection, 80/10/10 mask/random/keep,
  // doc-local replacement draw — all md5 arithmetic, replayed by the
  // oracle with the unnest + ordered-string_agg formulation.
  def qMlmMask(s: SparkSession, dir: String): DataFrame =
    graft.operators.SpanCorrupt.mlm(t(s, dir, "documents"), "doc_id", "text")

  val qMlmMaskSql: String = {
    def fold(tag: String) =
      s"list_reduce(list_transform(regexp_split_to_array(" +
        s"substr(md5(CAST(doc_id AS VARCHAR) || ':$tag:' " +
        s"|| CAST(pos AS VARCHAR)), 1, 6), ''), " +
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
        "(a, x) -> a * 16 + x)"
    s"""WITH d AS (
       |  SELECT doc_id,
       |    regexp_split_to_array(lower(${sqlCollapse("text")}), ' ') AS ws
       |  FROM documents),
       |b AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM d
       |      WHERE len(ws) > 0 AND ws[1] <> ''),
       |toks AS (
       |  SELECT doc_id, n, ws, unnest(ws) AS tok,
       |    unnest(range(len(ws))) AS pos
       |  FROM b),
       |m AS (
       |  SELECT doc_id, n, pos, tok,
       |    ${fold("m1")} % 100 < 15 AS sel,
       |    ${fold("m2")} % 10 AS action,
       |    ws[CAST(${fold("m3")} % n + 1 AS INT)] AS repl
       |  FROM toks),
       |p AS (
       |  SELECT doc_id, n, pos, tok, sel,
       |    CASE WHEN NOT sel THEN tok
       |         WHEN action <= 7 THEN '[MASK]'
       |         WHEN action = 8 THEN repl
       |         ELSE tok END AS out_tok
       |  FROM m)
       |SELECT doc_id,
       |  string_agg(out_tok, ' ' ORDER BY pos) AS masked,
       |  coalesce(string_agg(tok, ' ' ORDER BY pos) FILTER (sel), '')
       |    AS labels,
       |  CAST(any_value(n) AS BIGINT) AS n_tokens,
       |  CAST(count(*) FILTER (sel) AS BIGINT) AS n_selected
       |FROM p GROUP BY 1""".stripMargin
  }

  // Fill-in-the-middle: md5-drawn cut points, PSM rendering — map-side
  // only; the oracle replays draw arithmetic and 1-based list slicing.
  def qFim(s: SparkSession, dir: String): DataFrame =
    graft.operators.SpanCorrupt.fim(t(s, dir, "documents"), "doc_id", "text")

  val qFimSql: String = {
    def fold(tag: String) =
      s"list_reduce(list_transform(regexp_split_to_array(" +
        s"substr(md5(CAST(doc_id AS VARCHAR) || '$tag'), 1, 6), ''), " +
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
        "(a, x) -> a * 16 + x)"
    s"""WITH d AS (
       |  SELECT doc_id,
       |    regexp_split_to_array(lower(${sqlCollapse("text")}), ' ') AS ws
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n,
       |    ${fold(":f1")} % (CAST(len(ws) AS BIGINT) + 1) AS c1
       |  FROM d WHERE len(ws) > 0 AND ws[1] <> ''),
       |c AS (
       |  SELECT doc_id, ws, n, c1,
       |    c1 + ${fold(":f2")} % (n - c1 + 1) AS c2
       |  FROM b)
       |SELECT doc_id, n AS n_tokens, c1, c2,
       |  -- coalesce: DuckDB's array_to_string of an EMPTY list is NULL
       |  -- (Spark's array_join is ''), and || would poison the row
       |  '<PRE> ' || coalesce(array_to_string(ws[1:CAST(c1 AS INT)], ' '), '')
       |    || ' <SUF> ' || coalesce(array_to_string(
       |      ws[CAST(c2 + 1 AS INT):CAST(n AS INT)], ' '), '')
       |    || ' <MID> ' || coalesce(array_to_string(
       |      ws[CAST(c1 + 1 AS INT):CAST(c2 AS INT)], ' '), '') AS fim
       |FROM c""".stripMargin
  }

  // Deflate-redundancy quality signal (Gopher-family): map-side native
  // expression. NOT in the driver registry — zlib output is build-scoped
  // and DuckDB has no deflate, so there is no computable oracle; the
  // verification surface is CompressRatioSpec (value orderings pinned)
  // plus the SQL function registration in GraftExtensions, the same
  // spec-only treatment as XlsSource. Kept here as the library's usage
  // example for the expression.
  def qCompressRatio(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        graft.functions.CompressRatioExpr.compress_ratio(col("text"))
          .as("compress_ratio"))

  // Jensen-Shannon drift of each source's token distribution against
  // the corpus: integer counts -> fixed-shape probabilities -> per-term
  // contributions rounded DECIMAL(20,12) (the PMI ln treatment) ->
  // order-independent decimal sum.
  def qJsDiv(s: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.jsAgainstCorpus(
      t(s, dir, "documents"), "source", "text")

  val qJsDivSql: String =
    s"""WITH terms AS (
       |  SELECT source AS g, term FROM (
       |    SELECT source, unnest(ws) AS term FROM (
       |      SELECT source, regexp_split_to_array(lower(${sqlCollapse("text")}), ' ') AS ws
       |      FROM documents WHERE source IS NOT NULL) d)
       |  WHERE term <> ''),
       |pg AS (SELECT g, term, count(*) AS c_gt FROM terms GROUP BY 1, 2),
       |pt AS (SELECT term, sum(c_gt) AS c_t FROM pg GROUP BY 1),
       |gt AS (SELECT g, sum(c_gt) AS n_g FROM pg GROUP BY 1),
       |tot AS (SELECT sum(c_t) AS n FROM pt),
       |pairs AS (
       |  SELECT gt.g, pt.term, pt.c_t, gt.n_g, tot.n, pg.c_gt
       |  FROM pt CROSS JOIN tot CROSS JOIN gt
       |  LEFT JOIN pg ON pg.g = gt.g AND pg.term = pt.term),
       |c AS (
       |  SELECT g, n_g, CAST(
       |    CASE WHEN c_gt IS NULL THEN
       |      0.5 * (CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
       |        * ln((CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
       |             / ((CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0))
       |    ELSE
       |      0.5 * (CAST(c_gt AS DOUBLE) / CAST(n_g AS DOUBLE))
       |        * ln((CAST(c_gt AS DOUBLE) / CAST(n_g AS DOUBLE))
       |             / ((CAST(c_gt AS DOUBLE) / CAST(n_g AS DOUBLE)
       |                 + CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0))
       |      + 0.5 * (CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
       |        * ln((CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
       |             / ((CAST(c_gt AS DOUBLE) / CAST(n_g AS DOUBLE)
       |                 + CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0))
       |    END AS DECIMAL(20,12)) AS contrib
       |  FROM pairs)
       |SELECT g AS source, CAST(max(n_g) AS BIGINT) AS n_tokens,
       |  CAST(sum(contrib) AS DOUBLE) AS js_div
       |FROM c GROUP BY 1""".stripMargin

  // Weighted sampling WITHOUT replacement: exactly 5 docs per language,
  // longer documents proportionally likelier (Efraimidis–Spirakis keys
  // u^(1/w) from a 48-bit md5 uniform, decimal-rounded pow waypoint).
  // The oracle replays draw, key, and cut.
  def qWorSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.worSample(
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        col("n_chars")),
      "doc_id", "lang", "n_chars", 5)

  val qWorSampleSql: String = {
    // 12 hex chars -> 48-bit BIGINT (the 6-char sqlHexFold idiom, wider)
    val fold48 =
      "list_reduce(list_transform(regexp_split_to_array(" +
        "substr(md5(CAST(doc_id AS VARCHAR)), 1, 12), ''), " +
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
        "(a, x) -> a * 16 + x)"
    s"""WITH s AS (
       |  SELECT lang, doc_id,
       |    CAST(CAST(pow((CAST($fold48 AS DOUBLE) + 0.5) / 281474976710656.0,
       |      1.0 / CAST(n_chars AS DOUBLE)) AS DECIMAL(14,12)) AS DOUBLE)
       |      AS wor_key
       |  FROM documents
       |  WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0.0)
       |SELECT lang, rank, doc_id, wor_key FROM (
       |  SELECT lang, doc_id, wor_key, row_number() OVER (
       |    PARTITION BY lang ORDER BY wor_key DESC, doc_id) AS rank
       |  FROM s) WHERE rank <= 5""".stripMargin
  }

  val qSampleStratifiedSql: String = {
    // 6 hex chars -> BIGINT (pure-SQL fold; same idiom as simhash oracle)
    val hexFold = sqlHexFold("doc_id")
    // FLOOR on both engines — a bare BIGINT cast rounds in DuckDB but
    // truncates in Spark, diverging whenever rate*buckets is fractional
    // (the 'es' rate makes it 3333.5 so the gate exercises this)
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang, $hexFold % $SampleBuckets AS b FROM documents)
       |WHERE b < CAST(FLOOR((CASE lang WHEN 'en' THEN 0.2 WHEN 'zh' THEN 0.5
       |                WHEN 'es' THEN 0.33335
       |                ELSE 1.0 END) * $SampleBuckets) AS BIGINT)""".stripMargin
  }

  // --------------------------------------------------------- pii redaction
  // The synthetic corpus carries no PII, so the query plants a
  // deterministic contact block per document (email + phone + CPF derived
  // from doc_id) and scrubs it — both engines synthesize and redact the
  // identical text, verifying the regex semantics end to end.
  def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Redaction
    val synth = concat(
      substring(col("text"), 1, 40),
      lit(" Contact: user"), col("doc_id").cast("string"),
      lit("@example.com or +55 11 98765-43"),
      lpad((col("doc_id") % 100).cast("string"), 2, "0"),
      lit(" CPF 123.456.789-0"), (col("doc_id") % 10).cast("string"))
    t(s, dir, "documents").select(
      col("doc_id"),
      Redaction.countMatches(synth, Redaction.EmailPattern).as("n_emails"),
      Redaction.countMatches(synth, Redaction.PhonePattern).as("n_phones"),
      Redaction.countMatches(synth, Redaction.CpfPattern).as("n_cpfs"),
      Redaction.redactAll(synth).as("redacted"))
  }

  val qPiiRedactSql: String = {
    import graft.functions.Redaction
    val synth =
      "substr(text, 1, 40) || ' Contact: user' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com or +55 11 98765-43' || " +
        "lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || " +
        "' CPF 123.456.789-0' || CAST(doc_id % 10 AS VARCHAR)"
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(s, '${Redaction.EmailPattern}')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(s, '${Redaction.PhonePattern}')) AS INT) AS n_phones,
       |  CAST(len(regexp_extract_all(s, '${Redaction.CpfPattern}')) AS INT) AS n_cpfs,
       |  regexp_replace(regexp_replace(regexp_replace(s,
       |    '${Redaction.EmailPattern}', '<EMAIL>', 'g'),
       |    '${Redaction.PhonePattern}', '<PHONE>', 'g'),
       |    '${Redaction.CpfPattern}', '<CPF>', 'g') AS redacted
       |FROM (SELECT doc_id, $synth AS s FROM documents)""".stripMargin
  }

  // --------------------------------------------------------------- tf-idf
  // Keyword extraction: top-3 characteristic terms per document. Ranking
  // uses the raw double score (ties on identical (tf, df) pairs break on
  // the term name); the compared projection drops the float itself — a
  // JVM-vs-DuckDB libm ln() can differ sub-ulp, and (rank, term, tf, df)
  // determine the score exactly for fixed N anyway.
  def qTfidf(s: SparkSession, dir: String): DataFrame =
    graft.operators.TfIdf.topTerms(t(s, dir, "documents"), "doc_id", "text", 3)
      .drop("tfidf")

  val qTfidfSql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, term FROM (
       |    SELECT doc_id, unnest(ws) AS term FROM (
       |      SELECT doc_id, regexp_split_to_array(lower(${sqlCollapse("text")}), ' ') AS ws
       |      FROM documents) d)
       |  WHERE term <> ''),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |idf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf, df,
       |    CAST(tf AS DOUBLE) * ln(n.n / CAST(df AS DOUBLE)) AS tfidf
       |  FROM tf JOIN idf USING (term) CROSS JOIN n)
       |SELECT doc_id, rank, term, tf, df FROM (
       |  SELECT *, CAST(row_number() OVER
       |    (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
       |  FROM scored) WHERE rank <= 3""".stripMargin

  // -------------------------------------------------------------- simhash
  // md5-derived bit planes (two 32-bit halves) so the DuckDB oracle
  // replays the identical hash -> votes -> bands -> hamming pipeline.
  // The xxhash64 variant (Dedup.simhashPairs) stays the throughput path,
  // spec-covered (hamming symmetry, planted near-dup recall).
  def qSimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsMd5(t(s, dir, "documents"), "doc_id", "text", 12)

  val qSimhashPairsSql: String = {
    // parse 8 hex chars -> BIGINT with a pure-SQL fold (DuckDB has no
    // hex-literal cast); matches Spark's conv(substring(md5,..),16,10)
    def hexFold(sub: String) =
      s"list_reduce(list_transform(regexp_split_to_array($sub, ''), " +
        s"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
        "(a, x) -> a * 16 + x)"
    s"""WITH toks AS (
       |  SELECT doc_id, md5(w) AS m FROM (
       |    SELECT doc_id, unnest(ws) AS w
       |    FROM (SELECT doc_id, regexp_split_to_array(${sqlCollapse("text")}, ' ') AS ws
       |          FROM documents) d)
       |  WHERE w <> ''),
       |hx AS (SELECT doc_id, ${hexFold("substr(m, 1, 8)")} AS h1,
       |              ${hexFold("substr(m, 9, 8)")} AS h2 FROM toks),
       |votes AS (
       |  SELECT doc_id, j,
       |    SUM(CASE WHEN ((h1 >> j) & 1) = 1 THEN 1 ELSE -1 END) AS v1,
       |    SUM(CASE WHEN ((h2 >> j) & 1) = 1 THEN 1 ELSE -1 END) AS v2
       |  FROM hx CROSS JOIN range(0, 32) r(j) GROUP BY doc_id, j),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN v1 > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sh_lo,
       |    CAST(SUM(CASE WHEN v2 > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sh_hi
       |  FROM votes GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, sh_lo, sh_hi, b.bi AS band_idx,
       |    CASE b.bi WHEN 0 THEN sh_lo & 65535 WHEN 1 THEN (sh_lo >> 16) & 65535
       |              WHEN 2 THEN sh_hi & 65535 ELSE (sh_hi >> 16) & 65535 END AS band_val
       |  FROM sig CROSS JOIN range(0, 4) b(bi))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sh_lo, b.sh_lo)) +
       |       bit_count(xor(a.sh_hi, b.sh_hi)) AS INT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       |  AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh_lo, b.sh_lo)) +
       |      bit_count(xor(a.sh_hi, b.sh_hi)) <= 12""".stripMargin
  }

  // ------------------------------------------------------ embedding topk
  def qEmbedTopk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    CosineSearch.bruteForceTopK(e, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", 3)
  }

  // Norms/dots via exact decimal sums over the unnested element index —
  // order-independent, so GROUP BY aggregation order can't perturb them.
  private val normCte =
    """n AS (SELECT vec_id, embedding,
      |  CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,12))) AS DECIMAL(30,12)) AS norm_sq
      |  FROM embeddings CROSS JOIN range(1, 65) t(i) GROUP BY vec_id, embedding)""".stripMargin

  val qEmbedTopkSql: String =
    s"""WITH $normCte,
       |pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(20,12))) AS DECIMAL(30,12)) AS dot,
       |    any_value(q.norm_sq) AS qn, any_value(c.norm_sq) AS cn
       |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
       |  CROSS JOIN range(1, 65) t(i)
       |  GROUP BY q.vec_id, c.vec_id),
       |scored AS (
       |  SELECT query_id, nn_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos_sim
       |  FROM pairs)
       |SELECT query_id, rank, nn_id, cos_sim FROM (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY query_id ORDER BY cos_sim DESC, nn_id) AS rank
       |  FROM scored) WHERE rank <= 3""".stripMargin

  // ------------------------------------------------------ weighted sample
  // Soft quality filtering: each document survives with probability equal
  // to its quality score (clamped [0,1]) via the deterministic md5-bucket
  // decision — the softer curation rule used when a hard threshold hurts
  // corpus diversity. The oracle replays the identical score arithmetic
  // (the q_text_stats quality fragment) and bucket fold.
  def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id"), col("lang"), col("text"))
    graft.operators.Sampling.weightedSample(
        docs, "doc_id", TextFunctions.qualityScore(col("text")), SampleBuckets)
      .select(col("doc_id"), col("lang"))
  }

  val qWeightedSampleSql: String =
    s"""WITH ${sqlQualityCtes("documents", "text", Seq("lang"))}
       |SELECT doc_id, lang FROM qw
       |WHERE ${sqlHexFold("doc_id")} % $SampleBuckets <
       |  CAST(FLOOR(least(1.0, greatest(0.0, qual)) * $SampleBuckets) AS BIGINT)""".stripMargin

  // ----------------------------------------------------- quality histogram
  // The measurement pass before thresholding: 20-bin histogram of the
  // quality score over [0, 1). Bin arithmetic is the same double
  // expression on both engines; integer bin indices, occupied bins only.
  private val HistBins = 20

  def qQualityHist(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusReport.scoreHistogram(
      t(s, dir, "documents"),
      TextFunctions.qualityScore(col("text")), HistBins)

  val qQualityHistSql: String = {
    val w = 1.0 / HistBins
    s"""WITH ${sqlQualityCtes("documents", "text", Nil)}
       |SELECT bin, 0.0 + CAST(bin AS DOUBLE) * $w AS lo_edge,
       |       count(*) AS n
       |FROM (SELECT LEAST(${HistBins - 1}, GREATEST(0,
       |        CAST(floor((qual - 0.0) / 1.0 * $HistBins) AS BIGINT))) AS bin
       |      FROM qw WHERE qual IS NOT NULL)
       |GROUP BY bin""".stripMargin
  }

  // ------------------------------------------------------- strata report
  // Per-language curation report: doc count, total tokens, decimal-exact
  // mean quality (summed in DECIMAL so aggregation order cannot perturb
  // the mean the filters would then be calibrated against).
  def qStrataReport(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusReport.strataReport(
      t(s, dir, "documents"), "lang", "text")

  val qStrataReportSql: String =
    s"""WITH ${sqlQualityCtes("documents", "text", Seq("lang"))},
       |q AS (SELECT lang, n_tokens,
       |        CAST(qual AS DECIMAL(20,12)) AS qd FROM qw)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(qd) AS DOUBLE) / CAST(count(qd) AS DOUBLE) AS avg_quality
       |FROM q GROUP BY lang""".stripMargin

  // --------------------------------------------------------- top fraction
  // Calibrated per-stratum selection: keep the best half of every
  // language by quality score (FineWeb-style "top X% per domain").
  // frac = 0.5 is exact in binary so ceil(frac * n) cannot diverge
  // between engines on representation noise.
  private val TopFrac = 0.5

  def qTopFraction(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      TextFunctions.qualityScore(col("text")).as("qual"))
    graft.operators.Sampling.keepTopFraction(
        scored, "doc_id", "qual", Seq("lang"), TopFrac)
      .select(col("doc_id"), col("lang"))
  }

  val qTopFractionSql: String =
    s"""WITH ${sqlQualityCtes("documents", "text", Seq("lang"))}
       |SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY qual DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM qw)
       |WHERE rn <= ceil($TopFrac * n)""".stripMargin

  // ------------------------------------------------------- gopher quality
  // Gopher-style document-quality rules (public paper thresholds narrowed
  // so both keep outcomes occur on the synthetic corpus): word-count
  // bounds, mean word length, symbol density, alphabetic-word fraction,
  // stopword floor. Metrics ride along with the verdict so the oracle
  // hash checks the arithmetic, not just the final booleans.
  private[graft] val Gopher = graft.operators.QualityFilter.GopherThresholds(
    minWords = 30, maxWords = 90, minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
    maxSymbolRatio = 0.1, minAlphaFrac = 0.8, minStopHits = 2)

  def qGopherQuality(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityFilter.gopherStats(
      t(s, dir, "documents"), "doc_id", "text", Gopher)

  val qGopherQualitySql: String = {
    val stopScore = sqlLangScore("(' ' || sl || ' ')",
      graft.operators.QualityFilter.StopMarkers)
    s"""WITH c AS (SELECT doc_id, ${sqlCollapse("text")} AS s,
       |             ${sqlCollapse("lower(text)")} AS sl FROM documents),
       |m AS (SELECT doc_id, s, ${sqlTokens("s")} AS n_words,
       |        $stopScore AS stop_hits
       |      FROM c),
       |g AS (SELECT doc_id, n_words, stop_hits,
       |  CASE WHEN n_words = 0 THEN 0.0
       |       ELSE CAST(length(s) - (n_words - 1) AS DOUBLE)
       |            / CAST(n_words AS DOUBLE) END AS mean_word_len,
       |  CASE WHEN n_words = 0 THEN 0.0
       |       ELSE CAST((length(s) - length(replace(s, '#', ''))) / 1
       |               + (length(s) - length(replace(s, '...', ''))) / 3 AS DOUBLE)
       |            / CAST(n_words AS DOUBLE) END AS symbol_ratio,
       |  CASE WHEN n_words = 0 THEN 0.0
       |       ELSE CAST(len(list_filter(regexp_split_to_array(s, ' '),
       |                    w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
       |            / CAST(n_words AS DOUBLE) END AS alpha_frac
       |  FROM m)
       |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
       |  stop_hits,
       |  (n_words BETWEEN ${Gopher.minWords} AND ${Gopher.maxWords})
       |   AND (mean_word_len BETWEEN ${Gopher.minMeanWordLen}
       |          AND ${Gopher.maxMeanWordLen})
       |   AND symbol_ratio <= ${Gopher.maxSymbolRatio}
       |   AND alpha_frac >= ${Gopher.minAlphaFrac}
       |   AND stop_hits >= ${Gopher.minStopHits} AS keep
       |FROM g""".stripMargin
  }

  // ---------------------------------------------------------- IVF search
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    CosineSearch.ivfTopK(
      vecs = e,
      centroids = e.filter(col("vec_id") < 16),
      queries = e.filter(col("vec_id") < 50),
      idCol = "vec_id", vecCol = "embedding", centroidIdCol = "vec_id", k = 3)
  }

  val qAnnIvfSql: String =
    s"""WITH $normCte,
       |cents AS (SELECT vec_id AS centroid_id, embedding AS c_vec, norm_sq AS c_norm_sq
       |          FROM n WHERE vec_id < 16),
       |asg_scored AS (
       |  SELECT v.vec_id, c.centroid_id,
       |    CAST(SUM(CAST(CAST(v.embedding[i] AS DOUBLE) * CAST(c.c_vec[i] AS DOUBLE) AS DECIMAL(20,12))) AS DOUBLE)
       |      / (sqrt(CAST(any_value(v.norm_sq) AS DOUBLE)) * sqrt(CAST(any_value(c.c_norm_sq) AS DOUBLE))) AS c_sim
       |  FROM n v CROSS JOIN cents c CROSS JOIN range(1, 65) t(i)
       |  GROUP BY v.vec_id, c.centroid_id),
       |assigned AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT *, row_number() OVER
       |      (PARTITION BY vec_id ORDER BY c_sim DESC, centroid_id) AS rn
       |    FROM asg_scored) WHERE rn = 1),
       |cand AS (
       |  SELECT qa.vec_id AS query_id, ca.vec_id AS nn_id, qa.centroid_id,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(20,12))) AS DOUBLE)
       |      / (sqrt(CAST(any_value(q.norm_sq) AS DOUBLE)) * sqrt(CAST(any_value(c.norm_sq) AS DOUBLE))) AS cos_sim
       |  FROM assigned qa
       |  JOIN n q ON q.vec_id = qa.vec_id AND qa.vec_id < 50
       |  JOIN assigned ca ON ca.centroid_id = qa.centroid_id AND ca.vec_id <> qa.vec_id
       |  JOIN n c ON c.vec_id = ca.vec_id
       |  CROSS JOIN range(1, 65) t(i)
       |  GROUP BY qa.vec_id, ca.vec_id, qa.centroid_id)
       |SELECT query_id, rank, nn_id, centroid_id, cos_sim FROM (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY query_id ORDER BY cos_sim DESC, nn_id) AS rank
       |  FROM cand) WHERE rank <= 3""".stripMargin

  // ----------------------------------------------------------------- bm25
  // Ranked retrieval over the corpus for a fixed query bag. The compared
  // projection is the ranking plus the integer match profile; the ln-based
  // score itself is dropped (qTfidf's rule — sub-ulp libm differences) and
  // pinned by Bm25Spec instead.
  private val Bm25Terms = Seq("merge", "window", "dup")
  private val Bm25TopK = 100
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  def qBm25(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bm25.search(t(s, dir, "documents"), "doc_id", "text",
        Bm25Terms, Bm25TopK, Bm25K1, Bm25B)
      .drop("score")

  /** Shared BM25 oracle scoring chain (d/dd/m/tf/df/st/sc) — ONE
    * definition of the formula so the single-query and batch oracles
    * can never desynchronize. `matchPred` filters the token stream to
    * the query vocabulary; `scCols` is the sc key projection (the batch
    * form keeps `term` for the per-query join). */
  private def bm25ScoringCtes(matchPred: String, scCols: String): String =
    s"""d AS (SELECT doc_id, ${sqlCollapse("lower(text)")} AS sl
       |      FROM documents),
       |dd AS (SELECT doc_id, sl, ${sqlTokens("sl")} AS dl FROM d),
       |m AS (SELECT doc_id, dl, w AS term FROM (
       |        SELECT doc_id, dl, unnest(string_split(sl, ' ')) AS w
       |        FROM dd)
       |      WHERE $matchPred),
       |tf AS (SELECT doc_id, dl, term, count(*) AS tf
       |       FROM m GROUP BY doc_id, dl, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
       |       FROM dd),
       |sc AS (SELECT $scCols,
       |        CAST(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |                      / (CAST(df AS DOUBLE) + 0.5)) *
       |          (CAST(tf AS DOUBLE) * ${Bm25K1 + 1.0} /
       |           (CAST(tf AS DOUBLE) + $Bm25K1 * (${1.0 - Bm25B} +
       |             $Bm25B * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) /
       |               CAST(sum_dl AS DOUBLE))))
       |          AS DECIMAL(20,12)) AS s_term
       |       FROM tf JOIN df USING (term) CROSS JOIN st)""".stripMargin

  val qBm25Sql: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH ${bm25ScoringCtes(s"w IN ($terms)", "doc_id, tf")},
       |agg AS (SELECT doc_id, sum(s_term) AS sd, count(*) AS n_terms,
       |          CAST(sum(tf) AS BIGINT) AS sum_tf
       |        FROM sc GROUP BY doc_id)
       |SELECT CAST(row_number() OVER (ORDER BY sd DESC, doc_id) AS INT)
       |    AS rank,
       |  doc_id, n_terms, sum_tf
       |FROM agg ORDER BY sd DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  // ------------------------------------------------------------ bm25 multi
  // Batch retrieval: two standing queries answered in one corpus pass,
  // per-query ranking. Same compared projection rule as q_bm25.
  private val Bm25Queries =
    Seq(("qa", "merge"), ("qa", "window"), ("qa", "dup"),
      ("qb", "spark"), ("qb", "stream"))
  private val Bm25MultiTopK = 20

  def qBm25Multi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Bm25Queries.toDF("qid", "term")
    graft.operators.Bm25.searchMany(t(s, dir, "documents"), "doc_id",
        "text", q, "qid", "term", Bm25MultiTopK, Bm25K1, Bm25B)
      .drop("score")
  }

  val qBm25MultiSql: String = {
    val values = Bm25Queries.map { case (q, t) => s"('$q', '$t')" }
      .mkString(", ")
    s"""WITH q(qid, term) AS (VALUES $values),
       |${bm25ScoringCtes("w IN (SELECT DISTINCT term FROM q)",
          "doc_id, term, tf")},
       |agg AS (SELECT qid, doc_id, sum(s_term) AS sd, count(*) AS n_terms,
       |          CAST(sum(tf) AS BIGINT) AS sum_tf
       |        FROM sc JOIN q USING (term) GROUP BY qid, doc_id)
       |SELECT qid AS query_id, rank, doc_id, n_terms, sum_tf FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY sd DESC, doc_id) AS INT) AS rank
       |  FROM agg) WHERE rank <= $Bm25MultiTopK""".stripMargin
  }

  // ------------------------------------------------------------ bigram lm
  // Bigram-LM self-scoring: the compared projection is the integer count
  // profile (bigram counts, context totals, unseen count) — every join
  // and aggregation in the operator is checked exactly; the ln-based
  // avg_logprob is dropped (qTfidf's rule) and pinned by NgramLmSpec.
  def qNgramLm(s: SparkSession, dir: String): DataFrame =
    graft.operators.NgramLm.selfScore(t(s, dir, "documents"),
        "doc_id", "text")
      .drop("avg_logprob")

  val qNgramLmSql: String =
    s"""WITH c AS (SELECT doc_id, ${sqlCollapse("lower(text)")} AS sl
       |           FROM documents),
       |bg AS (SELECT doc_id,
       |        unnest(list_transform(range(1, len(a)), i -> a[i])) AS w1,
       |        unnest(list_transform(range(1, len(a)), i -> a[i+1])) AS w2
       |       FROM (SELECT doc_id, string_split(sl, ' ') AS a FROM c)),
       |m AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
       |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM m GROUP BY w1)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(c12) AS BIGINT) AS sum_c12,
       |  CAST(sum(c1) AS BIGINT) AS sum_c1,
       |  CAST(0 AS BIGINT) AS n_unseen
       |FROM bg JOIN m USING (w1, w2) JOIN ctx USING (w1)
       |GROUP BY doc_id""".stripMargin

  // -------------------------------------------------------------- pmi
  // PMI collocation mining: top adjacent pairs by pointwise mutual
  // information. The compared projection is the ranking plus the
  // integer count profile; the ln-based pmi is dropped (qBm25's rule,
  // decimal-rounded before ranking on both engines).
  private val PmiMinPairCount = 2L
  private val PmiTopK = 50

  def qPmi(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cooccurrence.pmi(t(s, dir, "documents"), "text",
        PmiMinPairCount, PmiTopK)
      .drop("pmi")

  val qPmiSql: String =
    s"""WITH c AS (SELECT ${sqlCollapse("lower(text)")} AS sl
       |           FROM documents),
       |a AS (SELECT string_split(sl, ' ') AS a FROM c),
       |u AS (SELECT w, count(*) AS c FROM
       |        (SELECT unnest(a) AS w FROM a) GROUP BY w),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM u),
       |bg AS (SELECT
       |        unnest(list_transform(range(1, len(a)), i -> a[i])) AS w1,
       |        unnest(list_transform(range(1, len(a)), i -> a[i+1])) AS w2
       |       FROM a),
       |p AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
       |      HAVING count(*) >= $PmiMinPairCount),
       |sc AS (SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
       |         CAST(ln(CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE) /
       |              (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)))
       |           AS DECIMAL(20,12)) AS pmi
       |       FROM p JOIN u u1 ON u1.w = p.w1
       |         JOIN u u2 ON u2.w = p.w2 CROSS JOIN n)
       |SELECT CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT)
       |    AS rank,
       |  w1, w2, c12, c1, c2
       |FROM sc ORDER BY pmi DESC, w1, w2 LIMIT $PmiTopK""".stripMargin

  // ------------------------------------------------------------- dsir
  // DSIR importance reweighting: hashed-ngram LLR against the English
  // subset as the target distribution, then top-quarter selection per
  // language ([[Sampling.keepTopFraction]]). Compared projection is the
  // selected set with its integer feature profile; the ln-based score
  // is decimal-rounded per bucket before any sum (qBm25's rule).
  private val DsirHexDigits = 3
  private val DsirAlpha = 1.0
  private val DsirFrac = 0.25
  private val DsirTargetLang = "en"

  def qDsir(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.operators.ImportanceWeights.scoreAgainstTarget(
      t(s, dir, "documents"), "doc_id", "text",
      col("lang") === DsirTargetLang, DsirHexDigits, DsirAlpha,
      carry = Seq("lang"))
    graft.operators.Sampling.keepTopFraction(
        scored, "doc_id", "score", Seq("lang"), DsirFrac)
      .select(col("doc_id"), col("lang"), col("n_feats"), col("n_scored"))
  }

  val qDsirSql: String = {
    val b = math.pow(16.0, DsirHexDigits)
    val aB = DsirAlpha * b
    s"""WITH c AS (SELECT doc_id, lang, ${sqlCollapse("lower(text)")} AS sl
       |           FROM documents),
       |t AS (SELECT doc_id, lang, string_split(sl, ' ') AS a FROM c),
       |fb AS (SELECT doc_id, lang, substr(md5(feat), 1, $DsirHexDigits)
       |           AS bucket
       |       FROM (SELECT doc_id, lang, unnest(list_concat(a,
       |               list_transform(range(1, len(a)),
       |                 i -> a[i] || ' ' || a[i+1]))) AS feat
       |             FROM t)),
       |tc AS (SELECT bucket, count(*) AS tcnt FROM fb
       |       WHERE lang = '$DsirTargetLang' GROUP BY bucket),
       |rc AS (SELECT bucket, count(*) AS rcnt FROM fb GROUP BY bucket),
       |tot AS (SELECT
       |          COALESCE((SELECT CAST(sum(tcnt) AS BIGINT) FROM tc), 0)
       |            AS tt,
       |          COALESCE((SELECT CAST(sum(rcnt) AS BIGINT) FROM rc), 0)
       |            AS rt),
       |lr AS (SELECT bucket,
       |         CAST(ln((CAST(COALESCE(tcnt, 0) AS DOUBLE) + $DsirAlpha) /
       |                 (CAST(tt AS DOUBLE) + $aB)) -
       |              ln((CAST(COALESCE(rcnt, 0) AS DOUBLE) + $DsirAlpha) /
       |                 (CAST(rt AS DOUBLE) + $aB))
       |           AS DECIMAL(20,12)) AS llr
       |       FROM tc FULL OUTER JOIN rc USING (bucket) CROSS JOIN tot),
       |db AS (SELECT doc_id, lang, bucket, count(*) AS nb FROM fb
       |       GROUP BY doc_id, lang, bucket),
       |sc AS (SELECT doc_id, lang, CAST(sum(nb) AS BIGINT) AS n_feats,
       |         CAST(sum(nb) AS BIGINT) AS n_scored,
       |         CAST(sum(CAST(nb AS DECIMAL(10,0)) * llr)
       |           AS DECIMAL(38,12)) AS score
       |       FROM db JOIN lr USING (bucket) GROUP BY doc_id, lang),
       |sel AS (SELECT *, row_number() OVER (PARTITION BY lang
       |            ORDER BY score DESC, doc_id) AS rn,
       |          count(*) OVER (PARTITION BY lang) AS nl
       |        FROM sc)
       |SELECT doc_id, lang, n_feats, n_scored FROM sel
       |WHERE rn <= ceil($DsirFrac * nl)""".stripMargin
  }

  // ----------------------------------------------------- leakage-free split
  // Train/val/test assignment keyed on the content FINGERPRINT, not the
  // document id: exact duplicates share a fingerprint, so they land in
  // the same split and cannot leak training text into evaluation.
  // Boundaries come from Splits.boundaries (exact decimal — shared with
  // this oracle string so both engines cut at identical integers).
  private val SplitFracs =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  def qSplitLeakfree(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      .withColumn("split",
        graft.operators.Splits.label(col("fp"), SplitFracs))
  }

  val qSplitLeakfreeSql: String = {
    val bounds = graft.operators.Splits.boundaries(SplitFracs, 10000)
    val cases = SplitFracs.map(_._1).zip(bounds).dropRight(1)
      .map { case (n, b) => s"WHEN b < $b THEN '$n'" }.mkString(" ")
    s"""SELECT doc_id, fp,
       |  CASE WHEN b IS NULL THEN NULL
       |       $cases ELSE '${SplitFracs.last._1}' END AS split
       |FROM (SELECT doc_id, fp, ${sqlHexFold("fp")} % 10000 AS b
       |      FROM (SELECT doc_id, md5(${sqlCollapse("lower(text)")}) AS fp
       |            FROM documents))""".stripMargin
  }

  // ------------------------------------------------------ percentile rank
  // Per-language percentile normalization of the quality score — the
  // cross-stratum-comparable form. (rank-1)/(n-1) is integer-derived
  // IEEE division, so unlike the ln-based scores the pct doubles ARE
  // hash-compared; ordering by qual is engine-safe because qualityScore
  // is built from exact-rounded ops only (q_top_fraction's precedent).
  def qPctRank(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusReport.percentileRank(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("qual")),
        col("qual"), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("pct"))

  // percent_rank() is the same (rank-1)/(n-1) IEEE division with the
  // same singleton-0.0 guard in both engines; the NULL filter mirrors
  // percentileRank's drop contract (q_quality_hist's precedent)
  val qPctRankSql: String =
    s"""WITH ${sqlQualityCtes("documents", "text", Seq("lang"))}
       |SELECT doc_id, lang,
       |  percent_rank() OVER (PARTITION BY lang ORDER BY qual ASC) AS pct
       |FROM qw WHERE qual IS NOT NULL""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_stats" -> (qTextStats _),
    "q_lang_id" -> (qLangId _),
    "q_fingerprint" -> (qFingerprint _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_ngram" -> (qDedupNgram _),
    "q_dedup_ngram_prefix" -> (qDedupNgramPrefix _),
    "q_minhash_sig" -> (qMinhashSig _),
    "q_tfidf" -> (qTfidf _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_dedup_keepbest" -> (qDedupKeepBest _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_wor_sample" -> (qWorSample _),
    "q_feature_hash" -> (qFeatureHash _),
    "q_js_div" -> (qJsDiv _),
    "q_span_corrupt" -> (qSpanCorrupt _),
    "q_fim" -> (qFim _),
    "q_mlm_mask" -> (qMlmMask _),
    "q_rrf" -> (qRrf _),
    "q_readability" -> (qReadability _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_simhash_pairs" -> (qSimhashPairs _),
    "q_embed_topk" -> (qEmbedTopk _),
    "q_ann_ivf" -> (qAnnIvf _),
    "q_gopher_quality" -> (qGopherQuality _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_top_fraction" -> (qTopFraction _),
    "q_quality_hist" -> (qQualityHist _),
    "q_strata_report" -> (qStrataReport _),
    "q_bm25" -> (qBm25 _),
    "q_ngram_lm" -> (qNgramLm _),
    "q_split_leakfree" -> (qSplitLeakfree _),
    "q_pct_rank" -> (qPctRank _),
    "q_bm25_multi" -> (qBm25Multi _),
    "q_pmi" -> (qPmi _),
    "q_dsir" -> (qDsir _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_text_stats" -> qTextStatsSql,
    "q_lang_id" -> qLangIdSql,
    "q_fingerprint" -> qFingerprintSql,
    "q_dedup_exact" -> qDedupExactSql,
    "q_dedup_ngram" -> qDedupNgramSql,
    "q_dedup_ngram_prefix" -> qDedupNgramSql,
    "q_minhash_sig" -> qMinhashSigSql,
    "q_tfidf" -> qTfidfSql,
    "q_dedup_minhash" -> qDedupMinhashSql,
    "q_dedup_clusters" -> qDedupClustersSql,
    "q_dedup_keepbest" -> qDedupKeepBestSql,
    "q_sample_stratified" -> qSampleStratifiedSql,
    "q_wor_sample" -> qWorSampleSql,
    "q_feature_hash" -> qFeatureHashSql,
    "q_js_div" -> qJsDivSql,
    "q_span_corrupt" -> qSpanCorruptSql,
    "q_fim" -> qFimSql,
    "q_mlm_mask" -> qMlmMaskSql,
    "q_rrf" -> qRrfSql,
    "q_readability" -> qReadabilitySql,
    "q_pii_redact" -> qPiiRedactSql,
    "q_simhash_pairs" -> qSimhashPairsSql,
    "q_embed_topk" -> qEmbedTopkSql,
    "q_ann_ivf" -> qAnnIvfSql,
    "q_gopher_quality" -> qGopherQualitySql,
    "q_weighted_sample" -> qWeightedSampleSql,
    "q_top_fraction" -> qTopFractionSql,
    "q_quality_hist" -> qQualityHistSql,
    "q_strata_report" -> qStrataReportSql,
    "q_bm25" -> qBm25Sql,
    "q_ngram_lm" -> qNgramLmSql,
    "q_split_leakfree" -> qSplitLeakfreeSql,
    "q_pct_rank" -> qPctRankSql,
    "q_bm25_multi" -> qBm25MultiSql,
    "q_pmi" -> qPmiSql,
    "q_dsir" -> qDsirSql,
  )
}
