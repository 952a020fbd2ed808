package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Event-pipeline query group: sessionization, semi-structured JSON
  * extraction, skew-safe salted aggregation, distinct counting.
  */
object QueriesEvents {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------- sessionize
  // Gap-based sessionization (30-min inactivity): lag + cumulative sum of
  // session-start markers — the batch form of stateful stream session
  // windows. Epoch-microsecond arithmetic keeps interval semantics
  // engine-identical.
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(run))
      // Raw ts is excluded from the output: the source carries sub-us
      // precision that the engines canonicalize differently (us vs ns);
      // event_id already identifies the row.
      .select(col("event_id"), col("user_id"), col("session_idx"))
  }

  val qSessionizeSql: String =
    """SELECT event_id, user_id,
      |  CAST(sum(new_session) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |FROM (
      |  SELECT *, CASE WHEN prev_us IS NULL
      |                   OR epoch_us(ts) - prev_us > 1800000000 THEN 1
      |            ELSE 0 END AS new_session
      |  FROM (SELECT event_id, user_id, ts,
      |          lag(epoch_us(ts), 1) OVER
      |            (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |        FROM events))""".stripMargin

  // ------------------------------------------------------- json extract
  // Semi-structured props column: path extraction + typed cast.
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("long").as("k_num"),
      get_json_object(col("props"), "$.missing").as("absent"))

  val qJsonExtractSql: String =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
      |  json_extract_string(props, '$.missing') AS absent
      |FROM events""".stripMargin

  // --------------------------------------------------------- salted agg
  // Two-phase salted aggregation == direct aggregation (the oracle is the
  // direct form — proving the skew-safe plan is semantics-preserving).
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    Skew.saltedSumCount(t(s, dir, "events"), Seq("event_type"), "value",
      saltSeed = col("event_id"), buckets = 16)
      // final render: decimal agg -> double (driver-compare parity)
      .withColumn("sum_value", col("sum_value").cast("double"))

  val qSaltedAggSql: String =
    """SELECT event_type,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  // ------------------------------------------------------------- as-of
  // Point-in-time join of each event to its user's latest state update
  // (state = every 10th event). The oracle uses DuckDB's native ASOF JOIN
  // — a different algorithm than the union-window formulation, so
  // agreement is strong evidence of correct semantics.
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val left = events.select(col("event_id"), col("user_id"), col("ts"))
    val state = events.filter(col("event_id") % 10 === 0)
      .select(col("user_id"), col("ts"), col("value").as("state_value"))
    graft.operators.AsOfJoin.asof(left, state, "user_id", "ts", "ts")
      .select(col("event_id"), col("user_id"), col("state_value"))
  }

  val qAsofJoinSql: String =
    """WITH state AS (
      |  SELECT user_id, ts, value AS state_value FROM events
      |  WHERE event_id % 10 = 0)
      |SELECT l.event_id, l.user_id, r.state_value
      |FROM events l ASOF LEFT JOIN state r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  // ------------------------------------------------------ distinct count
  def qDistinctUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  val qDistinctUsersSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize" -> (qSessionize _),
    "q_json_extract" -> (qJsonExtract _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_distinct_users" -> (qDistinctUsers _),
    "q_asof_join" -> (qAsofJoin _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_sessionize" -> qSessionizeSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_salted_agg" -> qSaltedAggSql,
    "q_distinct_users" -> qDistinctUsersSql,
    "q_asof_join" -> qAsofJoinSql,
  )
}
