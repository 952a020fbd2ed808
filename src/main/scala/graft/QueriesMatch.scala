package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Round-8 query group: fuzzy entity matching (edit-distance joins).
  */
object QueriesMatch {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------------- fuzzy pairs
  // All customer-name pairs within one edit. The oracle is the NAIVE
  // quadratic join (length filter + full levenshtein), so the hash
  // compare proves the q-gram prefix screen lossless on real data.
  def qFuzzyPairs(s: SparkSession, dir: String): DataFrame =
    FuzzyJoin.editDistancePairs(
      t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("s")),
      "id", "s", maxDist = 1)

  val qFuzzyPairsSql: String =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey
      | AND abs(length(a.c_name) - length(b.c_name)) <= 1
      |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin

  // ------------------------------------------------------- fuzzy match
  // Record linkage: a synthesized "dirty" feed (every even custkey's
  // name loses its 10th character) matched back against the master
  // customer table — each dirty row resolves to its closest master row
  // within 2 edits, ties to the smallest master key. The oracle replays
  // the naive scoring with a row_number argmin.
  def qFuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val master = customer
      .select(col("c_custkey").as("mid"), col("c_name").as("s"))
    val dirty = customer.select(col("c_custkey").as("qid"),
      when(col("c_custkey") % 2 === 0,
        concat(substring(col("c_name"), 1, 9), expr("substring(c_name, 11)")))
        .otherwise(col("c_name")).as("s"))
    FuzzyJoin.bestMatch(dirty, master, "qid", "mid", "s", maxDist = 2)
      .select(col("id_l").as("query_id"), col("id_r").as("match_id"),
        col("dist"))
  }

  val qFuzzyMatchSql: String =
    """WITH dirty AS (
      |  SELECT c_custkey AS query_id,
      |    CASE WHEN c_custkey % 2 = 0
      |         THEN substring(c_name, 1, 9) || substring(c_name, 11)
      |         ELSE c_name END AS s
      |  FROM customer),
      |scored AS (
      |  SELECT d.query_id, m.c_custkey AS match_id,
      |    levenshtein(d.s, m.c_name) AS dist
      |  FROM dirty d JOIN customer m
      |    ON abs(length(d.s) - length(m.c_name)) <= 2
      |  WHERE levenshtein(d.s, m.c_name) <= 2)
      |SELECT query_id, match_id, CAST(dist AS BIGINT) AS dist
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY dist, match_id) AS rn
      |      FROM scored)
      |WHERE rn = 1""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_pairs" -> (qFuzzyPairs _),
    "q_fuzzy_match" -> (qFuzzyMatch _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_fuzzy_pairs" -> qFuzzyPairsSql,
    "q_fuzzy_match" -> qFuzzyMatchSql,
  )
}
