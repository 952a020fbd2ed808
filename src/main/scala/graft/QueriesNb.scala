package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.NaiveBayes

/** Round-12 query group: trainable text classification — multinomial
  * Naive Bayes self-trained on the documents table (lang as the label),
  * the relational form of the FastText-style routing/quality gates an
  * LLM-data pipeline runs at ingest. The oracle replays tokenization,
  * add-one smoothing, DECIMAL(20,12) log quantization, and the
  * deterministic argmax tie-break. */
object QueriesNb {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def qNaiveBayes(s: SparkSession, dir: String): DataFrame =
    NaiveBayes.classify(t(s, dir, "documents"), "doc_id", "lang", "text")

  val qNaiveBayesSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS sl
      |  FROM documents WHERE text IS NOT NULL),
      |tok AS (SELECT doc_id, lang, unnest(string_split(sl, ' ')) AS w
      |        FROM base),
      |tokc AS (SELECT doc_id, lang, w FROM tok WHERE w <> ''),
      |ct AS (SELECT lang, w, count(*) AS c FROM tokc
      |       WHERE lang IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nl FROM ct
      |        GROUP BY 1),
      |voc AS (SELECT DISTINCT w FROM ct),
      |v AS (SELECT count(*) AS v FROM voc),
      |dpc AS (SELECT lang, count(*) AS dl FROM base
      |        WHERE lang IS NOT NULL GROUP BY 1),
      |dt AS (SELECT count(*) AS d FROM base WHERE lang IS NOT NULL),
      |priors AS (SELECT lang,
      |    CAST(ln(CAST(dl AS DOUBLE) / CAST(d AS DOUBLE))
      |      AS DECIMAL(20,12)) AS prior
      |  FROM dpc, dt),
      |grid AS (SELECT voc.w AS token, tot.lang AS cand,
      |    CAST(ln(CAST(coalesce(ct.c, 0) + 1 AS DOUBLE)
      |        / CAST(tot.nl + v.v AS DOUBLE)) AS DECIMAL(20,12)) AS lp
      |  FROM voc CROSS JOIN tot CROSS JOIN v
      |  LEFT JOIN ct ON ct.w = voc.w AND ct.lang = tot.lang),
      |sc AS (SELECT t.doc_id, t.lang, g.cand,
      |         sum(g.lp) AS lpsum, count(*) AS nt
      |  FROM tokc t JOIN grid g ON g.token = t.w
      |  GROUP BY 1, 2, 3),
      |sp AS (SELECT sc.doc_id, sc.lang, sc.cand, sc.nt,
      |         p.prior + sc.lpsum AS score
      |  FROM sc JOIN priors p ON p.lang = sc.cand),
      |rk AS (SELECT doc_id, lang, cand, nt, score,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY score DESC, cand DESC) AS rn
      |       FROM sp)
      |SELECT doc_id, lang, cand AS pred, CAST(score AS DOUBLE) AS score,
      |  CAST(nt AS BIGINT) AS n_tokens
      |FROM rk WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_naive_bayes" -> (qNaiveBayes _))

  val oracleSql: Map[String, String] = Map(
    "q_naive_bayes" -> qNaiveBayesSql)
}
