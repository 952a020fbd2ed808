package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Scd2, Skew}
import graft.streaming.{DedupStream, StreamJoin}

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

  // --------------------------------------------------------- salted join
  // Skew-safe equi-join == plain join (the oracle is the plain form):
  // fact keys salted into 8 buckets, dim replicated once per bucket, so
  // no reducer receives more than ~1/8 of a hot key. The manual fallback
  // for plans AQE skew splitting does not cover.
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = t(s, dir, "lineitem").select(
      col("l_orderkey").as("orderkey"), col("l_linenumber"),
      col("l_extendedprice"))
    val dim = t(s, dir, "orders").select(
      col("o_orderkey").as("orderkey"), col("o_totalprice"))
    Skew.saltedJoin(fact, dim, Seq("orderkey"),
        saltSeed = col("orderkey") + col("l_linenumber"), buckets = 8)
      .select(col("orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("o_totalprice"))
  }

  val qSaltedJoinSql: String =
    """SELECT l_orderkey AS orderkey, l_linenumber, l_extendedprice,
      |  o_totalprice
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin

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

  // Stateful streaming queries pin their shuffle-partition count for the
  // query's lifetime: state-store instances (and per-micro-batch commit
  // overhead) scale with partition count, and a batch-session default
  // sized for table scans (32) measured ~2.3x the wall time of a count
  // sized to the stream's actual volume. Production tuning rule:
  // partitions ~ stream rate, not cluster width. Restored afterwards —
  // queries run sequentially in the driver harness.
  private def withStreamPartitions[A](s: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, prev)
  }

  // ------------------------------------------------------- stream dedup
  // The STREAMING dedup path (DedupStream.dedupForever) run end-to-end as
  // a bounded AvailableNow job: documents plus a planted duplicate batch
  // are staged as multiple files, streamed one file per micro-batch, and
  // deduplicated by content fingerprint with cross-batch state. The
  // output is (fp, n_emitted): n_emitted must be exactly 1 for every
  // fingerprint — the planted duplicates arrive in a LATER micro-batch
  // than their originals, so only real cross-batch dedup state satisfies
  // the oracle (a stateless per-batch dropDuplicates would emit 2).
  // staged multi-file input per scale dir — setup, not the operator
  // under test; cached so repeated bench runs time the streaming job only
  private val stagedDedupInput =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def qStreamDedup(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_dedup")
    val out = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt").toString
    val staged = stagedDedupInput.computeIfAbsent(dir, { d =>
      val docs = Tables.load(s, d, "documents", parallelize = false)
      val target = tmp.resolve("in").toString
      // planted duplicates get doc_ids far above the originals, so the
      // range split puts them in their own file(s) -> their own batch(es)
      val dupes = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + lit(10000000L))
      docs.union(dupes).repartitionByRange(3, col("doc_id"))
        .write.parquet(target)
      target
    })
    val docs = Tables.load(s, dir, "documents", parallelize = false)
    val src = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
    withStreamPartitions(s, 8) {
      val query = DedupStream.dedupForever(src, "text")
        .select(col("fp"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .start()
      query.awaitTermination()
    }
    s.read.parquet(out).groupBy(col("fp")).agg(count(lit(1)).as("n_emitted"))
  }

  val qStreamDedupSql: String =
    """SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
      |  CAST(1 AS BIGINT) AS n_emitted
      |FROM documents""".stripMargin

  // -------------------------------------------------------- stream join
  // Stream-stream event-time interval join (click -> purchase attribution
  // within 4 hours) run end-to-end: both sides stream from the same
  // staged multi-file source one file per micro-batch, so pairs
  // straddling micro-batches exist only if watermarked join state is
  // retained correctly; each pair must be emitted exactly once. The
  // oracle is the plain batch interval join.
  private val AttributionHours = 4

  private val stagedJoinInput =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_join")
    val out = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt").toString
    val staged = stagedJoinInput.computeIfAbsent(dir, { d =>
      val target = tmp.resolve("in").toString
      // hash-split on event_id — event_id is almost perfectly
      // time-correlated, so a range split would yield time-contiguous
      // files and nearly every pair would complete within one
      // micro-batch; hashing the raw id scatters adjacent events across
      // all three files, making retained join state load-bearing for
      // most pairs. (Hashing a pre-computed mod-3 value would feed only
      // 3 distinct values into the partitioner and can collide them into
      // fewer than 3 partitions.)
      Tables.load(s, d, "events", parallelize = false)
        .repartition(3, col("event_id"))
        .write.parquet(target)
      target
    })
    val schema = Tables.load(s, dir, "events", parallelize = false).schema
    def src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    // watermark delay covers the corpus's full disorder (batches are
    // event_id-ordered, not time-ordered) so nothing is dropped and the
    // result equals the batch join exactly
    val joined = StreamJoin.attributionJoin(clicks, purchases,
        "user_id", "p_user", "click_ts", "purchase_ts",
        s"$AttributionHours hours", watermarkDelay = "40 days")
      .select(col("user_id"), col("click_id"), col("purchase_id"))
    withStreamPartitions(s, 8) {
      val q = joined.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .start()
      q.awaitTermination()
    }
    s.read.parquet(out)
  }

  // the window bound is compared in epoch MICROSECONDS on both engines:
  // Spark's ts is micro-truncated (Tables.load) while DuckDB reads the
  // raw ns values, so a raw-timestamp comparison could disagree within
  // 1 us of the bound; epoch_us makes both sides integer-exact, and the
  // constant derives from the same AttributionHours as the Spark path
  val qStreamJoinSql: String =
    s"""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
       |FROM events c JOIN events p
       |  ON c.user_id = p.user_id
       | AND c.event_type = 'click' AND p.event_type = 'purchase'
       | AND epoch_us(p.ts) >= epoch_us(c.ts)
       | AND epoch_us(p.ts) <= epoch_us(c.ts) +
       |     ${AttributionHours}::BIGINT * 3600000000""".stripMargin

  // ------------------------------------------------------ distinct count
  def qDistinctUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  val qDistinctUsersSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  // -------------------------------------------------------- scd2 history
  // Type-2 history of each user's event_type from the event log. Validity
  // bounds are emitted in epoch MICROSECONDS (qSessionize's rule: the
  // engines canonicalize sub-us precision differently; integers do not).
  def qScd2History(s: SparkSession, dir: String): DataFrame =
    Scd2.fromChangeLog(t(s, dir, "events"),
        Seq("user_id"), "ts", Seq("event_id"), Seq("event_type"))
      .select(col("user_id"), col("version"), col("event_type"),
        unix_micros(col("valid_from")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"),
        col("n_events"))

  // the change flag compares STRUCT-WRAPPED values on both engines: the
  // Spark side's lag(struct(tracked)) is NULL only on a key's first row
  // (a struct of NULLs is not NULL), so versions are always 1-based even
  // when the first tracked value is NULL — a bare-scalar lag comparison
  // would silently number such keys from 0
  val qScd2HistorySql: String =
    """WITH runs AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
      |    CASE WHEN lag(struct_pack(v := event_type)) OVER w
      |           IS NOT DISTINCT FROM struct_pack(v := event_type)
      |         THEN 0 ELSE 1 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |vers AS (
      |  SELECT *, sum(chg) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |  FROM runs),
      |hist AS (
      |  SELECT user_id, version, event_type, min(ts_us) AS valid_from_us,
      |    count(*) AS n_events
      |  FROM vers GROUP BY user_id, version, event_type)
      |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
      |  valid_from_us,
      |  lead(valid_from_us) OVER
      |    (PARTITION BY user_id ORDER BY version) AS valid_to_us,
      |  n_events
      |FROM hist""".stripMargin

  // ---------------------------------------------------------- scd2 apply
  // Daily-load path: history built from the first half of the log,
  // advanced by one snapshot of each user's LATEST event_type. Every
  // user is active in every time window of the synthetic log, so the
  // delete/insert outcomes are driven by modular key filters instead:
  // user_id % 5 = 0 is absent from history (snapshot INSERTs it),
  // user_id % 7 = 0 is absent from the snapshot (apply CLOSEs it) —
  // all four applySnapshot outcomes fire against the SQL twin.
  def qScd2Apply(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
    val hist = Scd2.fromChangeLog(
        ev.filter(col("ts") < cutoff && col("user_id") % 5 =!= 0),
        Seq("user_id"), "ts", Seq("event_id"), Seq("event_type"))
      .select(col("user_id"), col("event_type"),
        col("valid_from"), col("valid_to"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val snap = ev.filter(col("user_id") % 7 =!= 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("user_id"), col("event_type"))
    Scd2.applySnapshot(hist, snap, Seq("user_id"), Seq("event_type"),
        lit("2024-01-30 00:00:00").cast("timestamp"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("valid_from")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"))
  }

  val qScd2ApplySql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      |  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
      |    AND user_id % 5 <> 0),
      |runs AS (
      |  SELECT *, CASE WHEN lag(struct_pack(v := event_type)) OVER w
      |      IS NOT DISTINCT FROM struct_pack(v := event_type)
      |    THEN 0 ELSE 1 END AS chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |vers AS (
      |  SELECT *, sum(chg) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |  FROM runs),
      |hist AS (
      |  SELECT user_id, version, event_type, min(ts_us) AS vf
      |  FROM vers GROUP BY user_id, version, event_type),
      |hist2 AS (
      |  SELECT user_id, event_type, vf,
      |    lead(vf) OVER (PARTITION BY user_id ORDER BY version) AS vt
      |  FROM hist),
      |snap AS (
      |  SELECT user_id, event_type FROM (
      |    SELECT user_id, event_type, row_number() OVER
      |      (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC)
      |      AS rn
      |    FROM events WHERE user_id % 7 <> 0) WHERE rn = 1),
      |j AS (
      |  SELECT h.user_id AS hk, h.event_type AS hv, h.vf AS hvf,
      |         s.user_id AS sk, s.event_type AS sv,
      |         epoch_us(TIMESTAMP '2024-01-30 00:00:00') AS load_us
      |  FROM (SELECT * FROM hist2 WHERE vt IS NULL) h
      |  FULL OUTER JOIN snap s ON h.user_id = s.user_id)
      |SELECT hk AS user_id, hv AS event_type, hvf AS valid_from_us,
      |  load_us AS valid_to_us
      |FROM j WHERE hk IS NOT NULL AND (sk IS NULL OR hv IS DISTINCT FROM sv)
      |UNION ALL
      |SELECT hk, hv, hvf, NULL FROM j
      |WHERE hk IS NOT NULL AND sk IS NOT NULL AND hv IS NOT DISTINCT FROM sv
      |UNION ALL
      |SELECT sk, sv, load_us, NULL FROM j
      |WHERE sk IS NOT NULL AND (hk IS NULL OR hv IS DISTINCT FROM sv)
      |UNION ALL
      |SELECT user_id, event_type, vf, vt FROM hist2 WHERE vt IS NOT NULL"""
      .stripMargin

  // ---------------------------------------------------------------- funnel
  // Ordered-conversion funnel view -> click -> purchase. The operator
  // compares Spark's micro-truncated timestamps; the oracle compares
  // epoch_us integers — the same micro-domain ordering (qStreamJoin's
  // rule), and the output is epoch-us for the same reason.
  private val FunnelSteps = Seq("view", "click", "purchase")

  def qFunnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.earliest(t(s, dir, "events"),
        "user_id", "ts", "event_type", FunnelSteps)
      .select(col("user_id"),
        unix_micros(col("t1")).as("t1_us"),
        unix_micros(col("t2")).as("t2_us"),
        unix_micros(col("t3")).as("t3_us"),
        col("steps_completed"))

  val qFunnelSql: String = {
    val Seq(s1, s2, s3) = FunnelSteps
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type
       |            FROM events),
       |c1 AS (SELECT user_id, min(us) AS t1 FROM ev
       |       WHERE event_type = '$s1' GROUP BY user_id),
       |c2 AS (SELECT c1.user_id, t1,
       |         min(CASE WHEN e.us > c1.t1 THEN e.us END) AS t2
       |       FROM c1 LEFT JOIN ev e
       |         ON e.user_id = c1.user_id AND e.event_type = '$s2'
       |       GROUP BY c1.user_id, t1),
       |c3 AS (SELECT c2.user_id, t1, t2,
       |         min(CASE WHEN e.us > c2.t2 THEN e.us END) AS t3
       |       FROM c2 LEFT JOIN ev e
       |         ON e.user_id = c2.user_id AND e.event_type = '$s3'
       |       GROUP BY c2.user_id, t1, t2)
       |SELECT user_id, t1 AS t1_us, t2 AS t2_us, t3 AS t3_us,
       |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
       |            WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)
       |    AS steps_completed
       |FROM c3""".stripMargin
  }

  // ------------------------------------------------------------- retention
  // Weekly cohort retention triangle. Period indices are FLOOR division
  // of epoch-us on both sides (the operator pmod-adjusts Spark's
  // truncating DIV; DuckDB's // floors natively).
  private val RetentionDays = 7
  private val RetentionPeriodUs =
    graft.operators.Retention.periodUs(RetentionDays)

  def qRetention(s: SparkSession, dir: String): DataFrame =
    graft.operators.Retention.cohorts(t(s, dir, "events"),
      "user_id", "ts", RetentionDays)

  val qRetentionSql: String =
    s"""WITH act AS (SELECT DISTINCT user_id,
       |               epoch_us(ts) // $RetentionPeriodUs AS period
       |             FROM events),
       |coh AS (SELECT user_id, min(period) AS cohort_period
       |        FROM act GROUP BY user_id)
       |SELECT cohort_period, period - cohort_period AS period_offset,
       |  count(*) AS n_active
       |FROM act JOIN coh USING (user_id)
       |GROUP BY cohort_period, period - cohort_period""".stripMargin

  // ----------------------------------------------------------- transitions
  // First-order next-event transition matrix. Ordering is (ts,
  // event_id) within each user — micro-domain ts on both engines
  // (qStreamJoin's rule); p is a long/long double division, IEEE-exact.
  def qTransitions(s: SparkSession, dir: String): DataFrame =
    graft.operators.Transitions.matrix(t(s, dir, "events"),
      "user_id", "ts", "event_id", "event_type")

  val qTransitionsSql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_id,
      |              event_type
      |            FROM events),
      |st AS (SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |           ORDER BY us, event_id) AS to_type
      |       FROM ev),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM st
      |      WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c
      |      GROUP BY from_type)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
      |FROM c JOIN t USING (from_type)""".stripMargin

  // ----------------------------------------------------------- decay
  // Exponentially time-decayed engagement per user, reference date = the
  // newest event date. The one transcendental (pow) is decimal-rounded
  // per row before the multiply (qBm25's rule); value is exact at two
  // decimals; the sum runs entirely in decimal. DECIMAL(12,2) keeps the
  // product precision at 33 — below Spark's 38 cap, so neither engine
  // rescales it.
  private val DecayLambda = 0.9

  def qDecay(s: SparkSession, dir: String): DataFrame =
    graft.operators.DecayScore.scoreFromMaxDate(
        t(s, dir, "events"), "user_id", "ts", "value", DecayLambda)
      // compared projection: decimal -> double via a scale-6 waypoint
      // (unscaled fits 2^53 exactly, so the one division is correctly
      // rounded on both engines); a raw scale-14 cast has a >2^53
      // unscaled value and can diverge by an ulp
      .withColumn("score", col("score").cast("decimal(24,6)").cast("double"))

  val qDecaySql: String =
    s"""WITH r AS (SELECT max(CAST(ts AS DATE)) AS ref FROM events)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  -- round(), not a decimal cast: DuckDB's decimal->decimal cast
       |  -- TRUNCATES while Spark's rounds HALF_UP; round() half-away
       |  -- matches Spark for the positive scores here
       |  CAST(round(CAST(sum(CAST(value AS DECIMAL(12,2)) *
       |      CAST(pow($DecayLambda, greatest(
       |        date_diff('day', CAST(ts AS DATE), ref), 0))
       |        AS DECIMAL(20,12)))
       |    AS DECIMAL(38,14)), 6) AS DOUBLE) AS score
       |FROM events CROSS JOIN r
       |GROUP BY user_id""".stripMargin

  // --------------------------------------------------------- anomaly
  // Per-user daily-activity z-score outliers: mean/σ derive from exact
  // integer sums with one double division each, and IEEE sqrt is
  // correctly rounded, so z is engine-identical before the boundary
  // decimal rounding.
  private val AnomalyThreshold = 2.0
  private val AnomalyMinDays = 5

  def qAnomaly(s: SparkSession, dir: String): DataFrame =
    graft.operators.Anomaly.dailyOutliers(
        t(s, dir, "events"), "user_id", "ts", AnomalyThreshold, AnomalyMinDays)
      // compared projection: |z| < 10 so the scale-12 unscaled value fits
      // 2^53 — the decimal->double cast is correctly rounded on both sides
      .withColumn("z", col("z").cast("double"))

  val qAnomalySql: String =
    s"""WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
       |             CAST(count(*) AS BIGINT) AS n
       |           FROM events GROUP BY 1, 2),
       |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nd,
       |         CAST(sum(n) AS BIGINT) AS s,
       |         CAST(sum(n * n) AS BIGINT) AS q
       |       FROM d GROUP BY user_id),
       |z AS (SELECT d.user_id, d.day, d.n,
       |        CAST((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) /
       |            CAST(nd AS DOUBLE)) /
       |          sqrt(CAST(nd * q - s * s AS DOUBLE) /
       |            CAST(nd * nd AS DOUBLE)) AS DECIMAL(20,12)) AS z
       |      FROM d JOIN st USING (user_id)
       |      WHERE nd >= $AnomalyMinDays AND nd * q - s * s > 0)
       |SELECT user_id, day, n, CAST(z AS DOUBLE) AS z FROM z
       |WHERE abs(z) >= $AnomalyThreshold""".stripMargin

  // ------------------------------------------------------ heavy hitters
  // Misra-Gries sketch in the EXACT regime (k far above the event-type
  // cardinality: no decrement ever fires), so the estimates equal plain
  // group counts and err_bound is 0 — which is precisely what the oracle
  // asserts. The approximate regime is property-checked in the spec.
  private val HeavyK = 32

  def qHeavy(s: SparkSession, dir: String): DataFrame =
    graft.operators.HeavyHitters.heavyHitters(
      t(s, dir, "events"), Nil, "event_type", HeavyK)

  val qHeavySql: String =
    """SELECT event_type AS item, count(*) AS est,
      |  CAST(0 AS BIGINT) AS err_bound
      |FROM events GROUP BY event_type""".stripMargin

  def qHeavyUser(s: SparkSession, dir: String): DataFrame =
    graft.operators.HeavyHitters.heavyHitters(
      t(s, dir, "events"), Seq("user_id"), "event_type", HeavyK)

  val qHeavyUserSql: String =
    """SELECT user_id, event_type AS item, count(*) AS est,
      |  CAST(0 AS BIGINT) AS err_bound
      |FROM events GROUP BY user_id, event_type""".stripMargin

  // ------------------------------------------------------ session_window
  // Spark's NATIVE session-window operator (the streaming-capable path:
  // the identical groupBy(session_window(...)) runs under a watermark in
  // Structured Streaming with state-store merging — proven in
  // SessionWindowStreamSpec). The oracle is an independent algorithm:
  // DuckDB gap-islands (lag + running break sum). Session semantics:
  // an event extends the session while it falls strictly inside
  // [start, last_event + gap); end = last_event + gap. Boundaries exit
  // as epoch micros (engine-neutral integers).
  private val SessGapUs = 3L * 86400L * 1000000L

  def qSessionNative(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "3 days"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))

  val qSessionNativeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
       |           IS NULL
       |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY
       |           user_id ORDER BY ts)) >= $SessGapUs
       |    THEN 1 ELSE 0 END AS brk
       |  FROM events),
       |g AS (
       |  SELECT user_id, ts,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM e)
       |SELECT user_id, min(epoch_us(ts)) AS session_start_us,
       |  max(epoch_us(ts)) + $SessGapUs AS session_end_us,
       |  count(*) AS n_events
       |FROM g GROUP BY user_id, sid""".stripMargin

  // ------------------------------------------------------ quantile state
  // Mergeable KLL quantile state at (event_type, day) grain — every
  // group holds far fewer than k = 200 items, so the sketches have
  // never compacted and quantile reads are EXACT ⌈q·n⌉ order
  // statistics, which the oracle selects directly with a rank window.
  // (The approximate/merge regimes are spec-gated in QuantileSketchSpec;
  // this query pins the exact-regime contract plus build/read plumbing.)
  def qQuantileState(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("value").isNotNull)
    val state = graft.operators.QuantileSketch.build(
      ev, Seq("event_type", "day"), "value")
    graft.operators.QuantileSketch.quantiles(
      state, Seq("event_type", "day"), Seq(0.5, 0.9))
  }

  // Oracle-rank coupling, pinned: KLL's INCLUSIVE getQuantile returns
  // the value at the smallest 1-based rank i with i/n >= q — which is
  // exactly i = ⌈q·n⌉ in REAL arithmetic. The oracle therefore derives
  // the rank with exact integers from rational q (qn/qd), never a
  // float ceil: (qn·n + qd − 1) // qd. KLL's own i/n >= q compare runs
  // in doubles, but for these q the two agree at every n: when
  // i/n = qn/qd exactly, both sides round to the same double (equal →
  // inclusive hit, same i); otherwise |i/n − q| ≥ 1/(qd·n), which
  // dwarfs double rounding for any n below ~2^50. Adding a new q here
  // means adding its exact rational (qn, qd) row — do NOT reintroduce
  // ceil(q*n).
  val qQuantileStateSql: String =
    """WITH g AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value AS v
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT event_type, day, v,
      |    row_number() OVER (PARTITION BY event_type, day ORDER BY v)
      |      AS rn,
      |    count(*) OVER (PARTITION BY event_type, day) AS n
      |  FROM g),
      |qs AS (SELECT * FROM (VALUES (CAST(0.5 AS DOUBLE), 1, 2),
      |                             (CAST(0.9 AS DOUBLE), 9, 10))
      |       AS v(q, qn, qd))
      |SELECT event_type, day, q, v AS value
      |FROM r CROSS JOIN qs
      |WHERE rn = (qn * n + qd - 1) // qd""".stripMargin

  // ------------------------------------------------- time to conversion
  // Survival-analysis prep: per user, the time from first view to the
  // first subsequent purchase; users who never convert get the CENSORED
  // time to the observation end (converted = 0) — the (duration, event)
  // pair survival models train on. Integer micros, conditional
  // aggregation, one broadcast censor point.
  def qTimeToConvert(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val ref = ev.agg(max(col("us")).as("ref"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("view_us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("us") >= col("view_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("purchase_us"))
    firstView.join(conv, Seq("user_id"), "left")
      .crossJoin(broadcast(ref))
      .select(col("user_id"), col("view_us"),
        coalesce(col("purchase_us") - col("view_us"),
          col("ref") - col("view_us")).as("duration_us"),
        col("purchase_us").isNotNull.cast("int").as("converted"))
  }

  val qTimeToConvertSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
      |           FROM events),
      |r AS (SELECT max(us) AS ref FROM e),
      |fv AS (SELECT user_id, min(us) AS view_us FROM e
      |       WHERE event_type = 'view' GROUP BY 1),
      |cv AS (
      |  SELECT e.user_id, min(e.us) AS purchase_us
      |  FROM e JOIN fv ON e.user_id = fv.user_id
      |  WHERE e.event_type = 'purchase' AND e.us >= fv.view_us
      |  GROUP BY 1)
      |SELECT fv.user_id, fv.view_us,
      |  coalesce(cv.purchase_us - fv.view_us,
      |    (SELECT ref FROM r) - fv.view_us) AS duration_us,
      |  CAST(cv.purchase_us IS NOT NULL AS INT) AS converted
      |FROM fv LEFT JOIN cv ON fv.user_id = cv.user_id""".stripMargin

  // ---------------------------------------------------------- gains table
  // Decile gains/lift: rank users by an engagement score (event count),
  // decile them (the proven arithmetic ntile), and report per-decile
  // conversion plus cumulative capture vs the base rate — the standard
  // model-evaluation table, all ratios fixed-shape doubles of exact
  // integer counts.
  def qGainsTable(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Discretize
    val ev = t(s, dir, "events")
    val users = ev.groupBy(col("user_id")).agg(
        count(lit(1)).as("score"),
        max((col("event_type") === "purchase").cast("int")).as("converted"))
      .withColumn("__all", lit(1))
    // decile 1 = highest score (rank ascending -> invert)
    val binned = Discretize.equalFrequency(
        users, "__all", "score", "user_id", 10, "__b")
      .withColumn("decile", (lit(11) - col("__b")).cast("long"))
    val per = binned.groupBy(col("decile")).agg(
      count(lit(1)).as("n_users"),
      sum(col("converted")).cast("long").as("n_converted"))
    val tot = per.agg(sum(col("n_users")).as("tu"),
      sum(col("n_converted")).as("tc"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.crossJoin(broadcast(tot))
      .withColumn("cum_conv", sum(col("n_converted")).over(w))
      .select(col("decile"), col("n_users"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_users").cast("double"))
          .as("conv_rate"),
        (col("cum_conv").cast("double") / col("tc").cast("double"))
          .as("cum_capture"),
        ((col("n_converted").cast("double") / col("n_users").cast("double"))
          / (col("tc").cast("double") / col("tu").cast("double")))
          .as("lift"))
  }

  val qGainsTableSql: String =
    """WITH u AS (
      |  SELECT user_id, count(*) AS score,
      |    max(CAST(event_type = 'purchase' AS INT)) AS converted
      |  FROM events GROUP BY 1),
      |b AS (
      |  SELECT user_id, converted,
      |    11 - ntile(10) OVER (ORDER BY score, user_id) AS decile
      |  FROM u),
      |p AS (
      |  SELECT decile, count(*) AS n_users,
      |    CAST(sum(converted) AS BIGINT) AS n_converted
      |  FROM b GROUP BY 1),
      |t0 AS (SELECT sum(n_users) AS tu, sum(n_converted) AS tc FROM p)
      |SELECT decile, n_users, n_converted,
      |  CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
      |  CAST(sum(n_converted) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(tc AS DOUBLE) AS cum_capture,
      |  (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
      |    / (CAST(tc AS DOUBLE) / CAST(tu AS DOUBLE)) AS lift
      |FROM p CROSS JOIN t0""".stripMargin

  // -------------------------------------------------------- KM risk table
  // Kaplan-Meier risk table over the q_time_to_convert pairs: for each
  // distinct event time, subjects at risk (duration >= t), events d,
  // and censorings c at t — the integer-exact survival deliverable (the
  // curve itself is a sequential product, computed client-side from
  // these counts). Routed through Survival.riskTable: one groupBy on
  // duration + a reverse running count over the per-time aggregate —
  // no labels×times cross join anywhere in the plan (pinned in
  // PlanSpec), so the shape survives a 100× cohort.
  def qKmRisk(s: SparkSession, dir: String): DataFrame =
    graft.operators.Survival.riskTable(
      qTimeToConvert(s, dir).select(col("duration_us"), col("converted")),
      "duration_us", "converted")

  val qKmRiskSql: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
       |           FROM events),
       |r AS (SELECT max(us) AS ref FROM e),
       |fv AS (SELECT user_id, min(us) AS view_us FROM e
       |       WHERE event_type = 'view' GROUP BY 1),
       |cv AS (
       |  SELECT e.user_id, min(e.us) AS purchase_us
       |  FROM e JOIN fv ON e.user_id = fv.user_id
       |  WHERE e.event_type = 'purchase' AND e.us >= fv.view_us
       |  GROUP BY 1),
       |lab AS (
       |  SELECT coalesce(cv.purchase_us - fv.view_us,
       |      (SELECT ref FROM r) - fv.view_us) AS duration_us,
       |    CAST(cv.purchase_us IS NOT NULL AS INT) AS converted
       |  FROM fv LEFT JOIN cv ON fv.user_id = cv.user_id),
       |times AS (
       |  SELECT duration_us AS t, count(*) AS d FROM lab
       |  WHERE converted = 1 GROUP BY 1)
       |SELECT times.t,
       |  CAST(count(*) FILTER (lab.duration_us >= times.t) AS BIGINT)
       |    AS n_at_risk,
       |  CAST(any_value(times.d) AS BIGINT) AS d,
       |  CAST(count(*) FILTER (lab.duration_us = times.t
       |    AND lab.converted = 0) AS BIGINT) AS censored_at_t
       |FROM lab CROSS JOIN times
       |GROUP BY times.t""".stripMargin

  // ----------------------------------------------------- next-event label
  // Supervised sequence labels: each event's next event type and the
  // time until it (null at stream end) — one per-user window sort, the
  // training-label mirror of q_transitions' aggregate view.
  def qNextEvent(s: SparkSession, dir: String): DataFrame = {
    // ordering by the micros projection (monotone with ts, same ties)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        (lead(col("us"), 1).over(w) - col("us")).as("delta_us"))
  }

  val qNextEventSql: String =
    """SELECT event_id, user_id, event_type,
      |  lead(event_type) OVER w AS next_type,
      |  lead(epoch_us(ts)) OVER w - epoch_us(ts) AS delta_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  // ----------------------------------------------------------- cohort ltv
  // Cohort revenue (LTV) triangle — the money analogue of q_retention:
  // per (first-activity cohort period, offset), purchase revenue and
  // payer counts. Same pmod-adjusted FLOOR-division period idiom (exact
  // vs DuckDB //), revenue in exact decimal. Cohort membership comes
  // from ALL activity (a user's cohort is their first event, not their
  // first purchase).
  private val LtvPeriodUs = 7L * 86400L * 1000000L

  def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val withPeriod = ev.select(col("user_id"), col("event_type"),
      col("value"),
      expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $LtvPeriodUs))" +
        s" DIV $LtvPeriodUs").as("period"))
    val cohort = withPeriod.groupBy(col("user_id"))
      .agg(min(col("period")).as("cohort_period"))
    withPeriod
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .join(cohort, Seq("user_id"))
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(
        sum(col("value").cast("decimal(12,2)")).cast("double").as("revenue"),
        countDistinct(col("user_id")).as("n_payers"),
        count(lit(1)).as("n_purchases"))
  }

  val qCohortLtvSql: String =
    s"""WITH wp AS (
       |  SELECT user_id, event_type, value,
       |    epoch_us(ts) // $LtvPeriodUs AS period
       |  FROM events),
       |coh AS (SELECT user_id, min(period) AS cohort_period
       |        FROM wp GROUP BY user_id)
       |SELECT cohort_period, period - cohort_period AS period_offset,
       |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       |  count(DISTINCT wp.user_id) AS n_payers,
       |  count(*) AS n_purchases
       |FROM wp JOIN coh USING (user_id)
       |WHERE event_type = 'purchase' AND value IS NOT NULL
       |GROUP BY cohort_period, period - cohort_period""".stripMargin

  // ---------------------------------------------------------- churn
  // Churn labels: a user is churned if silent for the last 7 days of
  // the observation window — the standard supervised-label prep, one
  // aggregation plus a broadcast scalar (the DecayScore lazy-reference
  // shape). Integer micros end to end.
  def qChurnLabel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val ref = ev.agg(max(unix_micros(col("ts"))).as("ref"))
    ev.groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("n_events"))
      .crossJoin(broadcast(ref))
      .select(col("user_id"), col("last_us"), col("n_events"),
        (col("last_us") < col("ref") - lit(7L * 86400L * 1000000L))
          .cast("int").as("churned"))
  }

  val qChurnLabelSql: String =
    """WITH r AS (SELECT max(epoch_us(ts)) AS ref FROM events)
      |SELECT user_id, max(epoch_us(ts)) AS last_us,
      |  count(*) AS n_events,
      |  CAST(max(epoch_us(ts)) < any_value(ref) - 604800000000 AS INT)
      |    AS churned
      |FROM events CROSS JOIN r
      |GROUP BY user_id""".stripMargin

  // ------------------------------------------------- period-over-period
  // Daily revenue with previous-day percent change and a trailing 7-row
  // moving average — the reporting composite over one date-ordered
  // window sort. Revenue is exact decimal; pct/moving-average are
  // fixed-shape double divisions of exact partials (avg() itself is
  // avoided: its decimal intermediate rounding is engine-specific).
  def qPop(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("day"))
    val frame = w.rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .withColumn("mov_sum", sum(col("rev")).over(frame))
      .withColumn("mov_n", count(lit(1)).over(frame))
      .select(col("day").cast("string").as("day"), col("n_orders"),
        col("rev").cast("double").as("revenue"),
        when(col("prev").isNotNull && col("prev") =!= 0,
          (col("rev").cast("double") - col("prev").cast("double")) /
            col("prev").cast("double")).as("pct_change"),
        (col("mov_sum").cast("double") / col("mov_n").cast("double"))
          .as("mov_avg_7"))
  }

  val qPopSql: String =
    """WITH d AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT day, n_orders, rev,
      |    lag(rev) OVER (ORDER BY day) AS prev,
      |    sum(rev) OVER (ORDER BY day
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mov_sum,
      |    count(*) OVER (ORDER BY day
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mov_n
      |  FROM d)
      |SELECT day, n_orders, CAST(rev AS DOUBLE) AS revenue,
      |  CASE WHEN prev IS NOT NULL AND prev <> 0
      |    THEN (CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE))
      |         / CAST(prev AS DOUBLE) END AS pct_change,
      |  CAST(mov_sum AS DOUBLE) / CAST(mov_n AS DOUBLE) AS mov_avg_7
      |FROM w""".stripMargin

  // ---------------------------------------------------------------- rfm
  // RFM customer scoring: recency / frequency / monetary quintiles over
  // purchase history — the classic segmentation composite, built from
  // exact primitives (integer day arithmetic, decimal money,
  // Discretize.equalFrequency whose arithmetic-ntile was proven equal
  // to the engines' native ntile in q_bins). The global quintile is a
  // single-partition sort here; at scale score per cohort (a real key)
  // or swap in sketch cutoffs (Sampling.cutoffForKeepRate) — the
  // composite itself is unchanged.
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Discretize
    val p = t(s, dir, "events")
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
    val ref = p.agg(max(unix_micros(col("ts"))).as("ref"))
    val agg = p.groupBy(col("user_id")).agg(
        max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast("decimal(12,2)")).as("mon"))
      .crossJoin(broadcast(ref))
      .withColumn("recency_days", expr("(ref - last_us) div 86400000000"))
      .withColumn("__all", lit(1))
    val binned = Seq(("recency_days", "__br"), ("frequency", "__bf"),
      ("mon", "__bm")).foldLeft(agg) { case (d, (v, b)) =>
        Discretize.equalFrequency(d, "__all", v, "user_id", 5, b)
      }
    binned.select(col("user_id"), col("recency_days"), col("frequency"),
      col("mon").cast("double").as("monetary"),
      (lit(6) - col("__br")).cast("int").as("r"),
      col("__bf").as("f"), col("__bm").as("m"),
      ((lit(6) - col("__br")) * 100 + col("__bf") * 10 + col("__bm"))
        .cast("int").as("segment"))
  }

  val qRfmSql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) AS t, CAST(value AS DECIMAL(12,2))
      |    AS v
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |r0 AS (SELECT max(t) AS ref FROM p),
      |a AS (
      |  SELECT user_id, max(t) AS last_us, count(*) AS frequency,
      |    sum(v) AS mon
      |  FROM p GROUP BY 1),
      |b AS (
      |  SELECT user_id, (ref - last_us) // 86400000000 AS recency_days,
      |    frequency, mon
      |  FROM a CROSS JOIN r0),
      |s AS (
      |  SELECT user_id, recency_days, CAST(frequency AS BIGINT)
      |      AS frequency,
      |    CAST(mon AS DOUBLE) AS monetary,
      |    CAST(6 - ntile(5) OVER (ORDER BY recency_days, user_id) AS INT)
      |      AS r,
      |    CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INT) AS f,
      |    CAST(ntile(5) OVER (ORDER BY mon, user_id) AS INT) AS m
      |  FROM b)
      |SELECT user_id, recency_days, frequency, monetary, r, f, m,
      |  r * 100 + f * 10 + m AS segment
      |FROM s""".stripMargin

  // ------------------------------------------------------ session stats
  // Per-session aggregates over 1-day-gap sessions: length, duration,
  // conversion flag — the composite downstream of sessionization that
  // funnels/engagement dashboards actually consume.
  def qSessionStats(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 86400000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"))
  }

  val qSessionStatsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
      |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) IS NULL
      |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY
      |        user_id ORDER BY ts, event_id) > 86400000000
      |    THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_type, t,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM e)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  count(*) AS n_events,
      |  max(t) - min(t) AS duration_us,
      |  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS INT) AS converted
      |FROM g GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------- theta algebra
  // Audience overlap from theta sketch STATE: daily click-user and
  // purchase-user sketches intersect/difference without touching raw
  // events again. Under capacity (lgK=12 → 4096 ≫ daily uniques) every
  // estimate is an exact integer, so the oracle replays with
  // COUNT(DISTINCT …) set SQL.
  def qThetaOverlap(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val clicks = graft.operators.ThetaSketchOps.build(
      ev.filter(col("event_type") === "click"), Seq("day"), "user_id")
    val purchases = graft.operators.ThetaSketchOps.build(
      ev.filter(col("event_type") === "purchase"), Seq("day"), "user_id")
    graft.operators.ThetaSketchOps.overlap(clicks, purchases, Seq("day"))
  }

  val qThetaOverlapSql: String =
    """WITH c AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
      |  WHERE event_type = 'click' AND user_id IS NOT NULL),
      |p AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
      |  WHERE event_type = 'purchase' AND user_id IS NOT NULL),
      |a AS (SELECT day, count(DISTINCT user_id) AS n_a FROM c GROUP BY 1),
      |b AS (SELECT day, count(DISTINCT user_id) AS n_b FROM p GROUP BY 1),
      |u AS (
      |  SELECT day, count(DISTINCT user_id) AS n_union
      |  FROM (SELECT * FROM c UNION SELECT * FROM p) GROUP BY 1),
      |i AS (
      |  SELECT c.day, count(DISTINCT c.user_id) AS n_int
      |  FROM c JOIN p ON c.day = p.day AND c.user_id = p.user_id
      |  GROUP BY c.day)
      |SELECT a.day, CAST(n_a AS DOUBLE) AS n_a, CAST(n_b AS DOUBLE) AS n_b,
      |  CAST(n_union AS DOUBLE) AS n_union,
      |  CAST(coalesce(n_int, 0) AS DOUBLE) AS n_intersection,
      |  CAST(n_a AS DOUBLE) - CAST(coalesce(n_int, 0) AS DOUBLE)
      |    AS n_a_not_b
      |FROM a JOIN b USING (day) JOIN u USING (day)
      |LEFT JOIN i ON i.day = a.day""".stripMargin

  // ------------------------------------------------------- nearest event
  // Nearest-in-time join: each view is matched to the closest purchase
  // by the same user in EITHER direction (ties -> the earlier one) —
  // the attribution variant neither a backward nor a forward as-of
  // covers alone. Composition: both asofDirectional passes (each one
  // union+window sort-shuffle), then a map-side argmin of the two
  // candidates. The oracle is the naive per-user quadratic join with an
  // explicit (|delta|, ts) argmin window — an independent algorithm.
  def qNearestEvent(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    // dedup to one purchase per (user, ts): as-of requires unique right
    // timestamps per key (max keeps the choice deterministic)
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("p_value"))
      .withColumn("p_us", unix_micros(col("ts")))
    val back = graft.operators.AsOfJoin.asofDirectional(
        views, purch, "user_id", "ts", "ts", forward = false)
      .withColumnRenamed("p_us", "prev_us")
      .withColumnRenamed("p_value", "prev_value")
    val fwd = graft.operators.AsOfJoin.asofDirectional(
        views, purch, "user_id", "ts", "ts", forward = true)
      .select(col("event_id"), col("p_us").as("next_us"),
        col("p_value").as("next_value"))
    val j = back.join(fwd, Seq("event_id"))
    val dPrev = unix_micros(col("ts")) - col("prev_us")
    val dNext = col("next_us") - unix_micros(col("ts"))
    val usePrev = col("prev_us").isNotNull &&
      (col("next_us").isNull || dPrev <= dNext)
    j.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("view_us"),
      when(usePrev, col("prev_us")).otherwise(col("next_us")).as("match_us"),
      when(usePrev, col("prev_value")).otherwise(col("next_value"))
        .as("match_value"),
      when(col("prev_us").isNull && col("next_us").isNull,
          lit(null).cast("string"))
        .when(usePrev, lit("before")).otherwise(lit("after"))
        .as("direction"))
  }

  val qNearestEventSql: String =
    """WITH v AS (
      |  SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'view'),
      |p AS (
      |  SELECT user_id, ts, max(value) AS p_value FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1, 2),
      |c AS (
      |  SELECT v.event_id, v.user_id, epoch_us(v.ts) AS view_us,
      |    epoch_us(p.ts) AS match_us, p.p_value AS match_value,
      |    CASE WHEN p.ts <= v.ts THEN 'before' ELSE 'after' END
      |      AS direction,
      |    row_number() OVER (PARTITION BY v.event_id ORDER BY
      |      abs(epoch_us(v.ts) - epoch_us(p.ts)), p.ts) AS rn
      |  FROM v JOIN p ON p.user_id = v.user_id)
      |SELECT event_id, user_id, view_us, match_us, match_value, direction
      |FROM c WHERE rn = 1
      |UNION ALL
      |SELECT v.event_id, v.user_id, epoch_us(v.ts),
      |  NULL, NULL, NULL
      |FROM v
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p WHERE p.user_id = v.user_id)""".stripMargin

  // ----------------------------------------------------------- burstiness
  // Per-user burstiness of activity: the Fano factor (variance/mean) of
  // inter-event gaps — bots and schedulers sit near 0 (regular), human
  // sessions are bursty (>> mean). Gaps in exact integer micros from one
  // window sort; moment sums in DECIMAL (d² needs 38 digits), then the
  // textbook ratio in fixed-shape doubles — the Stats.corrByKey
  // discipline applied to a per-user dispersion statistic.
  def qBurstiness(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val deltas = t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("d", col("us") - lag(col("us"), 1).over(w))
      .filter(col("d").isNotNull)
    val agg = deltas.groupBy(col("user_id")).agg(
      count(lit(1)).as("n"),
      sum(col("d").cast("decimal(20,0)")).as("sd"),
      sum((col("d").cast("decimal(19,0)") * col("d").cast("decimal(19,0)")))
        .as("sd2"))
    val n = col("n").cast("double")
    val mean = col("sd").cast("double") / n
    val variance = col("sd2").cast("double") / n - mean * mean
    agg.select(col("user_id"), col("n"),
      mean.as("mean_gap_us"),
      when(mean > 0.0, variance / mean).otherwise(lit(0.0)).as("fano"))
  }

  val qBurstinessSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |d AS (
      |  SELECT user_id,
      |    us - lag(us) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id) AS d
      |  FROM e),
      |g AS (
      |  SELECT user_id, count(*) AS n,
      |    sum(CAST(d AS DECIMAL(20,0))) AS sd,
      |    sum(CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))) AS sd2
      |  FROM d WHERE d IS NOT NULL GROUP BY 1)
      |SELECT user_id, n,
      |  CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_us,
      |  CASE WHEN CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) > 0.0
      |    THEN (CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE)
      |          - (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
      |            * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)))
      |         / (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
      |    ELSE 0.0 END AS fano
      |FROM g""".stripMargin

  // -------------------------------------------------------- forecast eval
  // Seasonal-naive MASE (Hyndman-Koehler) over each event type's daily
  // volume: weekly-lag forecast error vs persistence error, exact
  // integer numerators, one final double division.
  private val Season = 7

  def qForecastEval(s: SparkSession, dir: String): DataFrame =
    graft.operators.ForecastEval.seasonalNaiveDaily(
      t(s, dir, "events"), "event_type", "ts", Season)

  val qForecastEvalSql: String =
    s"""WITH d AS (SELECT event_type AS k, CAST(ts AS DATE) AS dd,
       |    count(*) AS y
       |  FROM events GROUP BY 1, 2),
       |s AS (SELECT k, y,
       |    lag(y, $Season) OVER w AS ys, lag(y, 1) OVER w AS yp
       |  FROM d WINDOW w AS (PARTITION BY k ORDER BY dd)),
       |f AS (SELECT * FROM s WHERE ys IS NOT NULL AND yp IS NOT NULL)
       |SELECT k AS event_type, count(*) AS n_days,
       |  CAST(sum(abs(y - ys)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS mae_seasonal,
       |  CAST(sum(abs(y - yp)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS mae_naive,
       |  CASE WHEN sum(abs(y - yp)) <> 0 THEN
       |    CAST(sum(abs(y - ys)) AS DOUBLE) / CAST(sum(abs(y - yp)) AS DOUBLE)
       |  END AS mase
       |FROM f GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_forecast_eval" -> (qForecastEval _),
    "q_burstiness" -> (qBurstiness _),
    "q_session_native" -> (qSessionNative _),
    "q_nearest_event" -> (qNearestEvent _),
    "q_quantile_state" -> (qQuantileState _),
    "q_theta_overlap" -> (qThetaOverlap _),
    "q_rfm" -> (qRfm _),
    "q_pop" -> (qPop _),
    "q_churn_label" -> (qChurnLabel _),
    "q_cohort_ltv" -> (qCohortLtv _),
    "q_next_event" -> (qNextEvent _),
    "q_time_to_convert" -> (qTimeToConvert _),
    "q_km_risk" -> (qKmRisk _),
    "q_gains" -> (qGainsTable _),
    "q_session_stats" -> (qSessionStats _),
    "q_sessionize" -> (qSessionize _),
    "q_json_extract" -> (qJsonExtract _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_distinct_users" -> (qDistinctUsers _),
    "q_asof_join" -> (qAsofJoin _),
    "q_stream_dedup" -> (qStreamDedup _),
    "q_stream_join" -> (qStreamJoin _),
    "q_scd2_history" -> (qScd2History _),
    "q_scd2_apply" -> (qScd2Apply _),
    "q_funnel" -> (qFunnel _),
    "q_retention" -> (qRetention _),
    "q_transitions" -> (qTransitions _),
    "q_decay" -> (qDecay _),
    "q_anomaly" -> (qAnomaly _),
    "q_heavy" -> (qHeavy _),
    "q_heavy_user" -> (qHeavyUser _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_forecast_eval" -> qForecastEvalSql,
    "q_burstiness" -> qBurstinessSql,
    "q_session_native" -> qSessionNativeSql,
    "q_nearest_event" -> qNearestEventSql,
    "q_quantile_state" -> qQuantileStateSql,
    "q_theta_overlap" -> qThetaOverlapSql,
    "q_rfm" -> qRfmSql,
    "q_pop" -> qPopSql,
    "q_churn_label" -> qChurnLabelSql,
    "q_cohort_ltv" -> qCohortLtvSql,
    "q_next_event" -> qNextEventSql,
    "q_time_to_convert" -> qTimeToConvertSql,
    "q_km_risk" -> qKmRiskSql,
    "q_gains" -> qGainsTableSql,
    "q_session_stats" -> qSessionStatsSql,
    "q_sessionize" -> qSessionizeSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_salted_agg" -> qSaltedAggSql,
    "q_salted_join" -> qSaltedJoinSql,
    "q_distinct_users" -> qDistinctUsersSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_stream_dedup" -> qStreamDedupSql,
    "q_stream_join" -> qStreamJoinSql,
    "q_scd2_history" -> qScd2HistorySql,
    "q_scd2_apply" -> qScd2ApplySql,
    "q_funnel" -> qFunnelSql,
    "q_retention" -> qRetentionSql,
    "q_transitions" -> qTransitionsSql,
    "q_decay" -> qDecaySql,
    "q_anomaly" -> qAnomalySql,
    "q_heavy" -> qHeavySql,
    "q_heavy_user" -> qHeavyUserSql,
  )
}
