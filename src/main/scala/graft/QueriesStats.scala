package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Imputation, Stats}

/** Round-8 query group: grouped statistics with engine-exact contracts
  * (decimal partial sums + fixed-shape double formulas — see
  * operators.Stats scaladoc for why built-in corr/covar can't be
  * oracle-checked).
  */
object QueriesStats {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------------------- corr
  // Quantity↔price correlation per return flag. The oracle replays the
  // identical decimal partials and double formula; hash agreement means
  // bit-equal correlation coefficients.
  def qCorr(s: SparkSession, dir: String): DataFrame =
    Stats.corrByKey(t(s, dir, "lineitem"),
      "l_returnflag", "l_quantity", "l_extendedprice")

  val qCorrSql: String =
    """WITH a AS (
      |  SELECT l_returnflag AS k, count(*) AS n,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    sum(CAST(l_quantity AS DECIMAL(18,2)) *
      |        CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
      |    sum(CAST(l_quantity AS DECIMAL(18,2)) *
      |        CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |        CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |  GROUP BY 1)
      |SELECT k AS l_returnflag, n,
      |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      |        AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
      |  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  END AS corr
      |FROM a""".stripMargin

  // ------------------------------------------------------------ chisq
  // lang × source contingency cells with expected counts and chi²
  // contributions. Per-cell output only: the total statistic is a
  // double sum (reduction-order-dependent), so the exact contract stops
  // at cells.
  def qChisq(s: SparkSession, dir: String): DataFrame =
    Stats.chiSquareCells(t(s, dir, "documents"), "lang", "source")

  val qChisqSql: String = {
    val e = "CAST(rt.row_total AS DOUBLE) * CAST(ct.col_total AS DOUBLE)" +
      " / CAST(g.grand_total AS DOUBLE)"
    s"""WITH cells AS (
       |  SELECT lang, source, count(*) AS obs FROM documents
       |  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
       |rt AS (SELECT lang, sum(obs) AS row_total FROM cells GROUP BY 1),
       |ct AS (SELECT source, sum(obs) AS col_total FROM cells GROUP BY 1),
       |g AS (SELECT sum(obs) AS grand_total FROM cells)
       |SELECT c.lang, c.source, CAST(c.obs AS BIGINT) AS obs,
       |  $e AS expected,
       |  (CAST(c.obs AS DOUBLE) - $e) * (CAST(c.obs AS DOUBLE) - $e)
       |    / ($e) AS contrib
       |FROM cells c
       |JOIN rt ON c.lang = rt.lang
       |JOIN ct ON c.source = ct.source
       |CROSS JOIN g""".stripMargin
  }

  // ------------------------------------------------------------ trend
  // Per-user OLS trend of event value over time (x = epoch day of ts):
  // the engagement-drift detector. Same exactness contract as corr.
  def qTrend(s: SparkSession, dir: String): DataFrame =
    Stats.trendByKey(
      t(s, dir, "events").withColumn("day_idx",
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))),
      "user_id", "day_idx", "value")

  val qTrendSql: String =
    """WITH a AS (
      |  SELECT user_id, count(*) AS n,
      |    sum(CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |        AS DECIMAL(18,2))) AS sx,
      |    sum(CAST(value AS DECIMAL(18,2))) AS sy,
      |    sum(CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |        AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxy,
      |    sum(CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |        AS DECIMAL(18,2)) *
      |        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |        AS DECIMAL(18,2))) AS sxx
      |  FROM events
      |  WHERE ts IS NOT NULL AND value IS NOT NULL
      |  GROUP BY 1)
      |SELECT user_id, n,
      |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      |  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |  END AS slope,
      |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      |  THEN (CAST(sy AS DOUBLE)
      |        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |          * CAST(sx AS DOUBLE))
      |       / CAST(n AS DOUBLE)
      |  END AS intercept
      |FROM a""".stripMargin

  // -------------------------------------------------------- winsorize
  // Per-flag price clipping to exact [p05, p95] rank-select quantiles
  // (deterministic tie column keeps duplicate prices ordered). The
  // oracle replays the rank-select and the greatest/least clip.
  def qWinsorize(s: SparkSession, dir: String): DataFrame =
    Imputation.winsorize(
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice"))
        .withColumn("lid", col("l_orderkey") * 8 + col("l_linenumber")),
      "l_returnflag", "l_extendedprice", "lid", 0.05, 0.95)
      .drop("lid")

  val qWinsorizeSql: String =
    """WITH src AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
      |    l_orderkey * 8 + l_linenumber AS lid
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag AS k, l_extendedprice AS v, lid,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, lid) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM src),
      |q AS (
      |  SELECT k, p, v AS q FROM r CROSS JOIN (
      |    SELECT CAST(p AS DOUBLE) AS p FROM (
      |      VALUES (CAST(0.05 AS DOUBLE)), (CAST(0.95 AS DOUBLE))) t(p))
      |  WHERE rn = CAST(ceil(p * n) AS BIGINT)),
      |b AS (
      |  SELECT k, min(CASE WHEN p = 0.05 THEN q END) AS lo,
      |         min(CASE WHEN p = 0.95 THEN q END) AS hi
      |  FROM q GROUP BY k)
      |SELECT s.l_orderkey, s.l_linenumber, s.l_returnflag, s.l_extendedprice,
      |  greatest(least(s.l_extendedprice, b.hi), b.lo) AS l_extendedprice_w
      |FROM src s JOIN b ON s.l_returnflag = b.k""".stripMargin

  // ----------------------------------------------------------- impute
  // Mode imputation: market segments nulled for every 7th customer are
  // refilled with the per-nation mode (ties to the smallest segment).
  def qImpute(s: SparkSession, dir: String): DataFrame =
    Imputation.imputeMode(
      t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("seg")),
      "c_nationkey", "seg")

  val qImputeSql: String =
    """WITH src AS (
      |  SELECT c_custkey, c_nationkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
      |  FROM customer),
      |m AS (
      |  SELECT c_nationkey, seg AS mode_seg FROM (
      |    SELECT c_nationkey, seg,
      |      row_number() OVER (PARTITION BY c_nationkey
      |        ORDER BY count(*) DESC, seg) AS rn
      |    FROM src WHERE seg IS NOT NULL GROUP BY c_nationkey, seg)
      |  WHERE rn = 1)
      |SELECT s.c_custkey, s.c_nationkey, coalesce(s.seg, m.mode_seg) AS seg
      |FROM src s LEFT JOIN m ON s.c_nationkey = m.c_nationkey""".stripMargin

  // ------------------------------------------------------------ paths
  // Product-analytics path mining: each user-day's ordered event-type
  // sequence, counted corpus-wide, top-50 most common journeys. The
  // per-day path is built with a deterministic in-group sort
  // (array_sort over (ts, event_id) structs — no collect-order
  // dependence); DuckDB replays with ORDER BY inside string_agg.
  def qPaths(s: SparkSession, dir: String): DataFrame = {
    val byDay = t(s, dir, "events")
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(
            unix_micros(col("ts")).as("tsu"),
            col("event_id").as("eid"),
            col("event_type").as("et")))),
          x => x.getField("et"))).as("path"))
    byDay.groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(50)
  }

  val qPathsSql: String =
    """WITH p AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |  FROM events GROUP BY 1, 2)
      |SELECT path, count(*) AS n FROM p GROUP BY path
      |ORDER BY n DESC, path LIMIT 50""".stripMargin

  // -------------------------------------------------------- histogram
  // Equi-width histogram of document lengths: fixed literal origin and
  // width make the bin function a one-pass map expression (no
  // min/max pre-scan), integer arithmetic exact in both engines.
  private val HistWidth = 500L

  def qHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(floor(col("n_chars") / HistWidth).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select((col("bin") * HistWidth).as("bin_lo"),
        ((col("bin") + 1) * HistWidth).as("bin_hi"), col("n"))

  val qHistogramSql: String =
    s"""SELECT (n_chars // $HistWidth) * $HistWidth AS bin_lo,
       |  ((n_chars // $HistWidth) + 1) * $HistWidth AS bin_hi,
       |  count(*) AS n
       |FROM documents GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- welch
  // Daily A/B comparison of click vs purchase event values — Welch t
  // and Welch–Satterthwaite df per day, decimal partials + fixed-shape
  // double formulas (bit-replayable; see Stats.welchByKey).
  def qWelch(s: SparkSession, dir: String): DataFrame =
    Stats.welchByKey(
      t(s, dir, "events").withColumn("day", col("ts").cast("date")),
      "day", "event_type", "click", "purchase", "value")

  val qWelchSql: String =
    """WITH src AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type,
      |    CAST(value AS DECIMAL(18,2)) AS dv
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
      |a AS (
      |  SELECT day,
      |    count(*) FILTER (WHERE event_type = 'click') AS na,
      |    sum(dv) FILTER (WHERE event_type = 'click') AS sxa,
      |    sum(dv * dv) FILTER (WHERE event_type = 'click') AS sxxa,
      |    count(*) FILTER (WHERE event_type = 'purchase') AS nb,
      |    sum(dv) FILTER (WHERE event_type = 'purchase') AS sxb,
      |    sum(dv * dv) FILTER (WHERE event_type = 'purchase') AS sxxb
      |  FROM src GROUP BY 1),
      |m AS (
      |  SELECT day, na, nb,
      |    CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
      |    CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
      |    (CAST(na AS DOUBLE) * CAST(sxxa AS DOUBLE)
      |      - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE))
      |      / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0))
      |      / CAST(na AS DOUBLE) AS sea,
      |    (CAST(nb AS DOUBLE) * CAST(sxxb AS DOUBLE)
      |      - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE))
      |      / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))
      |      / CAST(nb AS DOUBLE) AS seb
      |  FROM a)
      |SELECT day, na AS n_a, nb AS n_b,
      |  CASE WHEN na > 0 THEN ma END AS mean_a,
      |  CASE WHEN nb > 0 THEN mb END AS mean_b,
      |  CASE WHEN na >= 2 AND nb >= 2 AND sea + seb > 0.0
      |    THEN (ma - mb) / sqrt(sea + seb) END AS t,
      |  CASE WHEN na >= 2 AND nb >= 2 AND sea + seb > 0.0
      |    THEN ((sea + seb) * (sea + seb))
      |      / (sea * sea / (CAST(na AS DOUBLE) - 1.0)
      |         + seb * seb / (CAST(nb AS DOUBLE) - 1.0)) END AS df
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- ks
  // Two-sample KS: did click values and purchase values come from the
  // same distribution? Running ECDFs over the pooled distinct values,
  // max |difference| — engine-exact (see Stats.ksStatistic).
  def qKs(s: SparkSession, dir: String): DataFrame =
    Stats.ksStatistic(t(s, dir, "events"),
      "event_type", "click", "purchase", "value")

  val qKsSql: String =
    """WITH pv AS (
      |  SELECT value,
      |    count(*) FILTER (WHERE event_type = 'click') AS ca,
      |    count(*) FILTER (WHERE event_type = 'purchase') AS cb
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
      |  GROUP BY 1),
      |cum AS (
      |  SELECT
      |    sum(ca) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM pv),
      |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv)
      |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
      |  max(abs(CAST(cum.cuma AS DOUBLE) / CAST(t.na AS DOUBLE)
      |    - CAST(cum.cumb AS DOUBLE) / CAST(t.nb AS DOUBLE))) AS ks
      |FROM cum CROSS JOIN t
      |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------------- gini
  // Concentration of document length per source — is one source's
  // volume dominated by a few huge documents? Integer rank-weighted
  // sums, one closing fixed-shape expression.
  def qGini(s: SparkSession, dir: String): DataFrame =
    Stats.giniByKey(t(s, dir, "documents"), "source", "n_chars", "doc_id")

  val qGiniSql: String =
    """WITH r AS (
      |  SELECT source, n_chars,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS i
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0),
      |a AS (
      |  SELECT source, count(*) AS n, sum(n_chars) AS s,
      |    sum(i * n_chars) AS ws
      |  FROM r GROUP BY 1)
      |SELECT source, CAST(n AS BIGINT) AS n,
      |  CASE WHEN n > 1 AND s > 0 THEN
      |    CAST(2 * ws AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
      |      - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) END AS gini
      |FROM a""".stripMargin

  // ------------------------------------------------------- mann-whitney
  // Distribution-free click-vs-purchase value comparison per day. The
  // oracle replays the doubled-mid-rank construction (integer-exact rank
  // sums and tie correction) and the fixed-shape z formula — hash
  // agreement means bit-equal U and z.
  def qMannWhitney(s: SparkSession, dir: String): DataFrame =
    Stats.mannWhitneyByKey(
      t(s, dir, "events").withColumn("day",
        date_format(col("ts"), "yyyy-MM-dd")),
      "day", "event_type", "click", "purchase", "value")

  val qMannWhitneySql: String =
    """WITH pv AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, value AS v,
      |    count(*) FILTER (event_type = 'click') AS ca,
      |    count(*) FILTER (event_type = 'purchase') AS cb
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT day, ca, cb,
      |    COALESCE(sum(ca + cb) OVER (PARTITION BY day ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM pv),
      |agg AS (
      |  SELECT day, CAST(sum(ca) AS BIGINT) AS n_a,
      |    CAST(sum(cb) AS BIGINT) AS n_b,
      |    sum(CAST(ca AS HUGEINT) *
      |        (CAST(cum AS HUGEINT) * 2 + CAST(ca + cb AS HUGEINT) + 1)) AS r2a,
      |    sum(CAST(ca + cb AS HUGEINT) * CAST(ca + cb AS HUGEINT) *
      |        CAST(ca + cb AS HUGEINT) - CAST(ca + cb AS HUGEINT)) AS ties
      |  FROM cum GROUP BY 1)
      |SELECT day, n_a, n_b,
      |  CAST(r2a - CAST(n_a AS HUGEINT) * (CAST(n_a AS HUGEINT) + 1)
      |       AS DOUBLE) / 2.0 AS u,
      |  CASE WHEN n_a > 0 AND n_b > 0 AND
      |    CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
      |      ((CAST(n_a + n_b AS DOUBLE) + 1.0)
      |       - CAST(ties AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE)
      |         * (CAST(n_a + n_b AS DOUBLE) - 1.0))) > 0.0
      |  THEN (CAST(r2a - CAST(n_a AS HUGEINT) * (CAST(n_a AS HUGEINT) + 1)
      |          AS DOUBLE) / 2.0
      |        - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
      |    / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
      |      ((CAST(n_a + n_b AS DOUBLE) + 1.0)
      |       - CAST(ties AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE)
      |         * (CAST(n_a + n_b AS DOUBLE) - 1.0))))
      |  END AS z
      |FROM agg""".stripMargin

  // ----------------------------------------------------------- spearman
  // Rank correlation of quantity vs price per return flag — the robust
  // companion to q_corr (same final formula shape, but over exact
  // integer doubled mid-ranks, so monotone-but-nonlinear relations and
  // outliers are handled). rank()+reverse-rank() tie identity on both
  // engines.
  def qSpearman(s: SparkSession, dir: String): DataFrame =
    Stats.spearmanByKey(t(s, dir, "lineitem"),
      "l_returnflag", "l_quantity", "l_extendedprice")

  val qSpearmanSql: String =
    """WITH base AS (
      |  SELECT l_returnflag AS k, l_quantity AS x, l_extendedprice AS y
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |r AS (
      |  SELECT k,
      |    rank() OVER (PARTITION BY k ORDER BY x ASC)
      |      + (count(*) OVER (PARTITION BY k) + 1)
      |      - rank() OVER (PARTITION BY k ORDER BY x DESC) AS rx,
      |    rank() OVER (PARTITION BY k ORDER BY y ASC)
      |      + (count(*) OVER (PARTITION BY k) + 1)
      |      - rank() OVER (PARTITION BY k ORDER BY y DESC) AS ry
      |  FROM base),
      |a AS (
      |  SELECT k, count(*) AS n,
      |    sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
      |    sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy,
      |    sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
      |    sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy
      |  FROM r GROUP BY 1)
      |SELECT k AS l_returnflag, n,
      |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      |        AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
      |  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  END AS rho
      |FROM a""".stripMargin

  // ------------------------------------------------------ feature scaling
  // Per-group min-max and z-score standardization — the model-input
  // scaling step, from ONE stats aggregation broadcast back onto the
  // rows. Moments are exact decimals; both scaled values are fixed-shape
  // double expressions (population std as sqrt(n·Σx² − (Σx)²)/n);
  // degenerate groups (constant value) gate to null.
  def qScaleFeatures(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").filter(col("value").isNotNull)
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
    val stats = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      min(d(col("value"))).as("mn"), max(d(col("value"))).as("mx"),
      sum(d(col("value"))).as("s"),
      sum(d(col("value")) * d(col("value"))).as("sxx"))
    val n = col("n").cast("double")
    val x = col("value").cast("double")
    val mn = col("mn").cast("double")
    val mx = col("mx").cast("double")
    val mean = col("s").cast("double") / n
    val std = sqrt(n * col("sxx").cast("double") -
      col("s").cast("double") * col("s").cast("double")) / n
    ev.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"), x.as("value"),
        when(col("mx") =!= col("mn"), (x - mn) / (mx - mn)).as("minmax"),
        when(std > 0.0, (x - mean) / std).as("zscore"))
  }

  val qScaleFeaturesSql: String =
    """WITH st AS (
      |  SELECT event_type, count(*) AS n,
      |    min(CAST(value AS DECIMAL(18,2))) AS mn,
      |    max(CAST(value AS DECIMAL(18,2))) AS mx,
      |    sum(CAST(value AS DECIMAL(18,2))) AS s,
      |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
      |      AS sxx
      |  FROM events WHERE value IS NOT NULL GROUP BY 1)
      |SELECT e.event_id, e.event_type, CAST(e.value AS DOUBLE) AS value,
      |  CASE WHEN st.mx <> st.mn THEN
      |    (CAST(e.value AS DOUBLE) - CAST(st.mn AS DOUBLE))
      |      / (CAST(st.mx AS DOUBLE) - CAST(st.mn AS DOUBLE)) END
      |    AS minmax,
      |  CASE WHEN sqrt(CAST(st.n AS DOUBLE) * CAST(st.sxx AS DOUBLE)
      |        - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
      |        / CAST(st.n AS DOUBLE) > 0.0
      |  THEN (CAST(e.value AS DOUBLE)
      |        - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
      |    / (sqrt(CAST(st.n AS DOUBLE) * CAST(st.sxx AS DOUBLE)
      |        - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
      |       / CAST(st.n AS DOUBLE))
      |  END AS zscore
      |FROM events e JOIN st ON e.event_type = st.event_type
      |WHERE e.value IS NOT NULL""".stripMargin

  // ------------------------------------------------------------- registry
  // --------------------------------------------------- bootstrap SE
  // Poisson-bootstrap standard error of mean(value) per event type
  // (operators.Bootstrap): 32 replicates in one pass, weights drawn
  // deterministically from md5 against integer Poisson(1) CDF
  // thresholds. The oracle rebuilds the identical replicate table —
  // same thresholds, same decimal roundings, same double formula — so
  // hash agreement pins the whole uncertainty pipeline.
  private val BootReps = 32

  def qBootstrapSe(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bootstrap.groupedMeanSe(t(s, dir, "events"),
      "event_id", "value", Seq("event_type"), BootReps)

  val qBootstrapSeSql: String = {
    def hexFold(sub: String) =
      s"list_reduce(list_transform(regexp_split_to_array($sub, ''), " +
        s"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
        "(a, x) -> a * 16 + x)"
    val h = hexFold(
      "substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)), 1, 8)")
    val thresholds = Seq(1580030168L, 3160060337L, 3950075421L,
      4213413783L, 4279248373L, 4292415291L, 4294609777L, 4294923276L,
      4294962463L)
    val caseChain = thresholds.zipWithIndex
      .map { case (t, k) => s"WHEN h < $t THEN $k" }
      .mkString(" ")
    s"""WITH seeds AS (SELECT unnest([${(0 until BootReps).mkString(", ")}]) AS rep),
       |hw AS (SELECT event_type, CAST(value AS DECIMAL(18,6)) AS x, rep,
       |    $h AS h
       |  FROM events CROSS JOIN seeds WHERE value IS NOT NULL),
       |w AS (SELECT event_type, x, rep,
       |    CASE $caseChain ELSE 9 END AS w FROM hw),
       |rm AS (SELECT event_type, rep,
       |    CAST(CAST(sum(w * x) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
       |      AS DECIMAL(20,12)) AS mean_r
       |  FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
       |sq AS (SELECT event_type,
       |    CAST(CAST(mean_r AS DOUBLE) AS DECIMAL(20,6)) AS m6,
       |    CAST(CAST(mean_r AS DOUBLE) * CAST(mean_r AS DOUBLE)
       |      AS DECIMAL(20,6)) AS m2
       |  FROM rm),
       |spread AS (SELECT event_type, count(*) AS r_used,
       |    sum(m6) AS s, sum(m2) AS ss FROM sq GROUP BY 1),
       |base AS (SELECT event_type, count(*) AS n,
       |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE) AS mean_val
       |  FROM events WHERE value IS NOT NULL GROUP BY 1)
       |SELECT b.event_type, b.n, b.mean_val,
       |  CASE WHEN r_used > 1 THEN sqrt(greatest(0.0,
       |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |       / CAST(r_used AS DOUBLE)) / (CAST(r_used AS DOUBLE) - 1.0)))
       |  END AS se_boot, r_used
       |FROM base b JOIN spread USING (event_type)""".stripMargin
  }

  // ------------------------------------------------- correlation matrix
  // All-pairs correlation of four lineitem measures in ONE scan
  // (Stats.corrMatrix): the oracle replays each pair with the identical
  // decimal partials and double formula as qCorr, one UNION ALL branch
  // per pair.
  private val CorrMatrixCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def qCorrMatrix(s: SparkSession, dir: String): DataFrame =
    Stats.corrMatrix(t(s, dir, "lineitem"), CorrMatrixCols)

  val qCorrMatrixSql: String = {
    def branch(a: String, b: String) =
      s"""SELECT '$a' AS col_x, '$b' AS col_y, count(*) AS n,
         |  CASE WHEN (CAST(count(*) AS DOUBLE)
         |         * CAST(sum(CAST($a AS DECIMAL(18,2)) * CAST($a AS DECIMAL(18,2))) AS DOUBLE)
         |         - CAST(sum(CAST($a AS DECIMAL(18,2))) AS DOUBLE)
         |           * CAST(sum(CAST($a AS DECIMAL(18,2))) AS DOUBLE)) > 0
         |    AND (CAST(count(*) AS DOUBLE)
         |         * CAST(sum(CAST($b AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2))) AS DOUBLE)
         |         - CAST(sum(CAST($b AS DECIMAL(18,2))) AS DOUBLE)
         |           * CAST(sum(CAST($b AS DECIMAL(18,2))) AS DOUBLE)) > 0
         |  THEN (CAST(count(*) AS DOUBLE)
         |         * CAST(sum(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2))) AS DOUBLE)
         |         - CAST(sum(CAST($a AS DECIMAL(18,2))) AS DOUBLE)
         |           * CAST(sum(CAST($b AS DECIMAL(18,2))) AS DOUBLE))
         |       / (sqrt(CAST(count(*) AS DOUBLE)
         |           * CAST(sum(CAST($a AS DECIMAL(18,2)) * CAST($a AS DECIMAL(18,2))) AS DOUBLE)
         |           - CAST(sum(CAST($a AS DECIMAL(18,2))) AS DOUBLE)
         |             * CAST(sum(CAST($a AS DECIMAL(18,2))) AS DOUBLE))
         |        * sqrt(CAST(count(*) AS DOUBLE)
         |           * CAST(sum(CAST($b AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2))) AS DOUBLE)
         |           - CAST(sum(CAST($b AS DECIMAL(18,2))) AS DOUBLE)
         |             * CAST(sum(CAST($b AS DECIMAL(18,2))) AS DOUBLE)))
         |  END AS corr
         |FROM lineitem WHERE $a IS NOT NULL AND $b IS NOT NULL""".stripMargin
    (for {
      i <- CorrMatrixCols.indices; j <- (i + 1) until CorrMatrixCols.size
    } yield branch(CorrMatrixCols(i), CorrMatrixCols(j)))
      .mkString("\nUNION ALL\n")
  }

  // ------------------------------------------------------------- CUPED
  // Variance-reduced A/B readout (operators.Cuped): units are users,
  // variant is a deterministic user-id split, the covariate is each
  // user's first-half activity and the outcome the second-half — the
  // canonical "pre-period predicts post-period" setup. Counts are
  // integers, so the decimal moments are exact and theta / adjusted
  // means / rho-squared replay bit-equal from the same fixed formula
  // shapes.
  private val CupedCut = "2024-01-16"

  def qCuped(s: SparkSession, dir: String): DataFrame = {
    val cut = lit(CupedCut).cast("timestamp")
    val units = t(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < cut, 1L).otherwise(0L)).as("x"),
        sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("y"))
      .withColumn("variant", pmod(col("user_id"), lit(2)).cast("int"))
    graft.operators.Cuped.adjustedMeans(units, "variant", "y", "x")
  }

  val qCupedSql: String = {
    def D(c: String) = s"CAST($c AS DOUBLE)"
    val varX = s"(${D("p_n")} * ${D("p_sxx")} - ${D("p_sx")} * ${D("p_sx")})"
    val varY = s"(${D("p_n")} * ${D("p_syy")} - ${D("p_sy")} * ${D("p_sy")})"
    val cov = s"(${D("p_n")} * ${D("p_sxy")} - ${D("p_sx")} * ${D("p_sy")})"
    s"""WITH units AS (
       |  SELECT user_id,
       |    CAST(user_id % 2 AS INT) AS variant,
       |    sum(CASE WHEN ts < TIMESTAMP '$CupedCut' THEN 1 ELSE 0 END)
       |      AS x,
       |    sum(CASE WHEN ts >= TIMESTAMP '$CupedCut' THEN 1 ELSE 0 END)
       |      AS y
       |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
       |per AS (
       |  SELECT variant, count(*) AS n,
       |    sum(CAST(x AS DECIMAL(18,2))) AS sx,
       |    sum(CAST(y AS DECIMAL(18,2))) AS sy,
       |    sum(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS sxy,
       |    sum(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) AS sxx,
       |    sum(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS syy
       |  FROM units GROUP BY 1),
       |pooled AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS p_n, sum(sx) AS p_sx,
       |    sum(sy) AS p_sy, sum(sxy) AS p_sxy, sum(sxx) AS p_sxx,
       |    sum(syy) AS p_syy
       |  FROM per)
       |SELECT variant, n,
       |  ${D("sy")} / ${D("n")} AS mean_y,
       |  CASE WHEN $varX > 0 THEN
       |    ${D("sy")} / ${D("n")} - ($cov / $varX) *
       |      (${D("sx")} / ${D("n")} - ${D("p_sx")} / ${D("p_n")})
       |  END AS mean_y_adj,
       |  CASE WHEN $varX > 0 THEN $cov / $varX END AS theta,
       |  CASE WHEN $varX > 0 AND $varY > 0 THEN
       |    ($cov * $cov) / ($varX * $varY)
       |  END AS var_reduction
       |FROM per CROSS JOIN pooled""".stripMargin
  }

  // -------------------------------------------------------------- did
  // Difference-in-differences readout over the same synthetic rollout
  // as q_cuped: treatment = user parity, post = after the cut, outcome
  // = event value. One global aggregate of 12 conditional decimal
  // partials, then fixed-shape doubles — did and its Welch-style SE
  // replay bit-equal.
  def qDid(s: SparkSession, dir: String): DataFrame = {
    val cut = lit(CupedCut).cast("timestamp")
    graft.operators.Cuped.diffInDiff(
      t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(pmod(col("user_id"), lit(2)).cast("int").as("treat"),
          when(col("ts") >= cut, 1).otherwise(0).as("post"),
          col("value")),
      "treat", "post", "value")
  }

  val qDidSql: String = {
    def D(c: String) = s"CAST($c AS DOUBLE)"
    def cell(cond: String, sfx: String) =
      s"""CAST(sum(CASE WHEN $cond AND value IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_$sfx,
         |    sum(CASE WHEN $cond THEN CAST(value AS DECIMAL(18,2)) END)
         |      AS sy_$sfx,
         |    sum(CASE WHEN $cond THEN CAST(value AS DECIMAL(18,2)) *
         |        CAST(value AS DECIMAL(18,2)) END) AS syy_$sfx""".stripMargin
    def mean(sfx: String) = s"${D(s"sy_$sfx")} / ${D(s"n_$sfx")}"
    def varTerm(sfx: String) =
      s"(${D(s"syy_$sfx")} - ${D(s"sy_$sfx")} * ${D(s"sy_$sfx")} / " +
        s"${D(s"n_$sfx")}) / (${D(s"n_$sfx")} - 1.0) / ${D(s"n_$sfx")}"
    val cells = Seq("c0", "c1", "t0", "t1")
    val nonEmpty = cells.map(s => s"n_$s > 0").mkString(" AND ")
    val seOk = cells.map(s => s"n_$s > 1").mkString(" AND ")
    s"""WITH a AS (
       |  SELECT
       |    ${cell("user_id % 2 = 0 AND ts < TIMESTAMP '" + CupedCut + "'", "c0")},
       |    ${cell("user_id % 2 = 0 AND ts >= TIMESTAMP '" + CupedCut + "'", "c1")},
       |    ${cell("user_id % 2 = 1 AND ts < TIMESTAMP '" + CupedCut + "'", "t0")},
       |    ${cell("user_id % 2 = 1 AND ts >= TIMESTAMP '" + CupedCut + "'", "t1")}
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
       |SELECT ${cells.map(s =>
            s"n_$s, CASE WHEN n_$s > 0 THEN ${mean(s)} END AS mean_$s")
            .mkString(",\n  ")},
       |  CASE WHEN $nonEmpty THEN
       |    (${mean("t1")} - ${mean("t0")}) - (${mean("c1")} - ${mean("c0")})
       |  END AS did,
       |  CASE WHEN $seOk THEN
       |    sqrt(${varTerm("t1")} + ${varTerm("t0")} +
       |      ${varTerm("c1")} + ${varTerm("c0")})
       |  END AS se_did
       |FROM a""".stripMargin
  }

  // ------------------------------------------------------------ bh adjust
  // Benjamini-Hochberg FDR correction across 25 brand-level "tests":
  // the pseudo p-value per brand is the exact share of its parts with
  // p_size > 25 (one integer division — deterministic; in production
  // the p's come from the Welch/Mann-Whitney families upstream). The
  // adjusted p is a suffix-min of fixed-shape doubles over the 25-row
  // TESTS table (never the corpus — the operator's documented window
  // contract), so the oracle hash-matches bit-for-bit.
  private val BhAlpha = 0.1

  def qBhAdjust(s: SparkSession, dir: String): DataFrame = {
    val tests = t(s, dir, "part").groupBy(col("p_brand"))
      .agg((sum(when(col("p_size") > 25, 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double")).as("p"))
    Stats.bhAdjust(tests, "p_brand", "p", BhAlpha)
  }

  val qBhAdjustSql: String =
    s"""WITH t AS (
       |  SELECT p_brand,
       |    CAST(sum(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE) AS p
       |  FROM part GROUP BY 1),
       |r AS (
       |  SELECT p_brand, p,
       |    CAST(row_number() OVER (ORDER BY p, p_brand) AS BIGINT) AS rank,
       |    count(*) OVER () AS m
       |  FROM t),
       |adj AS (
       |  SELECT p_brand, p, rank,
       |    least(1.0, min(CAST(m AS DOUBLE) * p / CAST(rank AS DOUBLE))
       |      OVER (ORDER BY p, p_brand
       |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |      AS p_adj
       |  FROM r)
       |SELECT p_brand, p, rank, p_adj, p_adj <= $BhAlpha AS reject
       |FROM adj""".stripMargin

  // ------------------------------------------------------------ kappa
  // Cohen's kappa per linestatus: agreement between two binary
  // "raters" (deep-discount vs returned-line flags) — integer cell
  // counts end to end, fixed-shape double κ; the oracle replays the
  // identical margin-product algebra.
  private def kappaRated(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(col("l_linestatus"),
      when(col("l_discount") >= 0.05, "hi").otherwise("lo").as("rater_a"),
      when(col("l_returnflag") === "R", "hi").otherwise("lo").as("rater_b"))

  private val sqlKappaRated =
    """rated AS (
      |  SELECT l_linestatus,
      |    CASE WHEN l_discount >= 0.05 THEN 'hi' ELSE 'lo' END AS a,
      |    CASE WHEN l_returnflag = 'R' THEN 'hi' ELSE 'lo' END AS b
      |  FROM lineitem)""".stripMargin

  def qKappa(s: SparkSession, dir: String): DataFrame =
    Stats.cohenKappa(kappaRated(s, dir), "l_linestatus",
      "rater_a", "rater_b")

  val qKappaSql: String =
    s"""WITH $sqlKappaRated,
       |cells AS (SELECT l_linestatus AS k, a, b, count(*) AS c
       |  FROM rated GROUP BY 1, 2, 3),
       |base AS (SELECT k, CAST(sum(c) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree
       |  FROM cells GROUP BY 1),
       |rt AS (SELECT k, a AS cat, sum(c) AS r FROM cells GROUP BY 1, 2),
       |ct AS (SELECT k, b AS cat, sum(c) AS l FROM cells GROUP BY 1, 2),
       |pe AS (SELECT rt.k, CAST(sum(rt.r * ct.l) AS BIGINT) AS pe_num
       |  FROM rt JOIN ct ON rt.k = ct.k AND rt.cat = ct.cat GROUP BY 1)
       |SELECT base.k AS l_linestatus, n, agree,
       |  CAST(coalesce(pe_num, 0) AS BIGINT) AS pe_num,
       |  CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
       |  CAST(coalesce(pe_num, 0) AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
       |  CASE WHEN CAST(coalesce(pe_num, 0) AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0 THEN
       |    (CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
       |      - CAST(coalesce(pe_num, 0) AS DOUBLE)
       |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       |    / (1.0 - CAST(coalesce(pe_num, 0) AS DOUBLE)
       |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       |  END AS kappa
       |FROM base LEFT JOIN pe ON base.k = pe.k""".stripMargin

  // ----------------------------------------------------------- mcnemar
  // Marginal homogeneity of the q_kappa rater pair: does the deep-
  // discount flag fire returned-lines asymmetrically? b/c are integer
  // discordant counts off one pass; chi2 one fixed-shape double.
  def qMcnemar(s: SparkSession, dir: String): DataFrame =
    Stats.mcnemar(
      t(s, dir, "lineitem").select(col("l_linestatus"),
        when(col("l_discount") >= 0.05, 1L).otherwise(0L).as("flag_a"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("flag_b")),
      "l_linestatus", "flag_a", "flag_b")

  val qMcnemarSql: String =
    """WITH r AS (
      |  SELECT l_linestatus AS k,
      |    CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS a,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS b
      |  FROM lineitem),
      |agg AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) FILTER (a = 1 AND b = 0) AS BIGINT) AS b,
      |    CAST(count(*) FILTER (a = 0 AND b = 1) AS BIGINT) AS c
      |  FROM r GROUP BY 1)
      |SELECT k AS l_linestatus, n, b, c,
      |  CASE WHEN b + c > 0 THEN
      |    CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
      |      / CAST(b + c AS DOUBLE)
      |  END AS chi2
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- psi
  // Population Stability Index of the returned-lines price distribution
  // against everything else over 10k-wide equal bins: add-one smoothed,
  // each bin term waypoint-rounded into DECIMAL(20,12) (the q_js_div
  // libm-ln treatment), decimal sum, one double at the end.
  def qPsi(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_returnflag"),
      floor(col("l_extendedprice") / 10000.0).cast("long").as("bin"))
    graft.operators.Divergence.psi(
      li.filter(col("l_returnflag") === "R"),
      li.filter(col("l_returnflag") =!= "R"), "bin")
  }

  val qPsiSql: String =
    """WITH b AS (SELECT l_returnflag,
      |    CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS bin
      |  FROM lineitem),
      |ac AS (SELECT bin, count(*) AS ca FROM b
      |  WHERE l_returnflag = 'R' AND bin IS NOT NULL GROUP BY 1),
      |ec AS (SELECT bin, count(*) AS ce FROM b
      |  WHERE l_returnflag <> 'R' AND bin IS NOT NULL GROUP BY 1),
      |j AS (SELECT coalesce(ac.bin, ec.bin) AS bin,
      |    coalesce(ca, 0) AS ca, coalesce(ce, 0) AS ce
      |  FROM ac FULL JOIN ec ON ac.bin = ec.bin),
      |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |  CAST(sum(ce) AS BIGINT) AS ne,
      |  CAST(count(*) AS BIGINT) AS nb FROM j),
      |terms AS (SELECT na, ne, nb,
      |    CAST((CAST(ca + 1 AS DOUBLE) / CAST(na + nb AS DOUBLE)
      |        - CAST(ce + 1 AS DOUBLE) / CAST(ne + nb AS DOUBLE))
      |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + nb AS DOUBLE))
      |          / (CAST(ce + 1 AS DOUBLE) / CAST(ne + nb AS DOUBLE)))
      |      AS DECIMAL(20,12)) AS t
      |  FROM j CROSS JOIN tot)
      |SELECT na AS n_actual, ne AS n_expected, nb AS n_bins,
      |  CAST(sum(t) AS DOUBLE) AS psi
      |FROM terms GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------ trimmed mean
  // 10%-each-side trimmed mean of extendedprice per returnflag: one
  // per-key sort, decimal middle-sum, one double division — the robust
  // location stat between median and mean.
  private val TrimFrac = 0.1

  def qTrimmedMean(s: SparkSession, dir: String): DataFrame =
    graft.operators.Robust.trimmedMeanByKey(
      t(s, dir, "lineitem").withColumn("tie",
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"))),
      "l_returnflag", "l_extendedprice", "tie", TrimFrac)

  val qTrimmedMeanSql: String =
    s"""WITH r AS (SELECT l_returnflag AS k, l_extendedprice AS v,
       |    CAST(l_orderkey AS VARCHAR) || '-' ||
       |      CAST(l_linenumber AS VARCHAR) AS tie
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |rk AS (SELECT k, v,
       |    CAST(row_number() OVER (PARTITION BY k ORDER BY v, tie)
       |      AS BIGINT) AS rn,
       |    count(*) OVER (PARTITION BY k) AS n FROM r),
       |cut AS (SELECT *,
       |    CAST(floor(CAST(n AS DOUBLE) * $TrimFrac) AS BIGINT) AS kk
       |  FROM rk),
       |agg AS (SELECT k, CAST(max(n) AS BIGINT) AS n,
       |    CAST(count(*) FILTER (rn > kk AND rn <= n - kk) AS BIGINT)
       |      AS n_kept,
       |    sum(CASE WHEN rn > kk AND rn <= n - kk
       |      THEN CAST(v AS DECIMAL(18,2)) END) AS s
       |  FROM cut GROUP BY 1)
       |SELECT k AS l_returnflag, n, n_kept,
       |  CASE WHEN n_kept > 0 THEN
       |    CAST(s AS DOUBLE) / CAST(n_kept AS DOUBLE) END AS trimmed_mean
       |FROM agg""".stripMargin

  // ------------------------------------------------------ robust trend
  // Composition: Theil-Sen over the daily event-count series per
  // event_type — the robust "events per day of growth" a dashboard
  // quotes when one spiky day would wreck OLS. 30-point series ->
  // ~435 pairs per key, comfortably inside the bounded-group contract.
  def qRobustTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        dayofmonth(col("ts")).cast("long").as("day"))
      .agg(count(lit(1)).as("cnt"))
    graft.operators.Robust.theilSenByKey(
      daily.withColumn("x", col("day").cast("double"))
        .withColumn("y", col("cnt").cast("double")),
      "event_type", "day", "x", "y")
  }

  val qRobustTrendSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
      |    count(*) AS cnt
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      |base AS (SELECT event_type AS k, day AS id,
      |    CAST(day AS DOUBLE) AS x, CAST(cnt AS DOUBLE) AS y FROM daily),
      |sl AS (SELECT a.k, (b.y - a.y) / (b.x - a.x) AS s,
      |    a.id AS i1, b.id AS i2
      |  FROM base a JOIN base b ON a.k = b.k AND a.id < b.id
      |  WHERE a.x <> b.x),
      |med AS (SELECT k, CAST(m AS BIGINT) AS n_pairs, s AS slope FROM (
      |    SELECT k, s,
      |      row_number() OVER (PARTITION BY k ORDER BY s, i1, i2) AS rn,
      |      count(*) OVER (PARTITION BY k) AS m
      |    FROM sl)
      |  WHERE rn = (m + 1) // 2),
      |res AS (SELECT base.k, n_pairs, slope, id,
      |    y - slope * x AS r
      |  FROM base JOIN med ON base.k = med.k),
      |inter AS (SELECT k, n_pairs, slope, r AS intercept FROM (
      |    SELECT k, n_pairs, slope, r,
      |      row_number() OVER (PARTITION BY k ORDER BY r, id) AS rn,
      |      count(*) OVER (PARTITION BY k) AS m
      |    FROM res)
      |  WHERE rn = (m + 1) // 2),
      |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1)
      |SELECT nk.k AS event_type, n,
      |  CAST(coalesce(inter.n_pairs, 0) AS BIGINT) AS n_pairs,
      |  slope, intercept
      |FROM nk LEFT JOIN inter ON nk.k = inter.k""".stripMargin

  // ------------------------------------------------------ fleiss kappa
  // Multi-rater agreement: treat each 4-line order as a subject rated
  // by 4 "annotators" into quantity terciles, per orderkey-parity
  // cohort — integer moments A/B, fixed-shape double κ; orders with a
  // different line count exercise the exclusion path. The oracle
  // replays counts, eligibility, and the exact double shapes.
  private val FleissRaters = 4

  def qFleissKappa(s: SparkSession, dir: String): DataFrame =
    Stats.fleissKappa(
      t(s, dir, "lineitem").select(
        (col("l_orderkey") % 2).as("cohort"), col("l_orderkey"),
        when(col("l_quantity") <= 17, "lo")
          .when(col("l_quantity") <= 34, "mid").otherwise("hi").as("cat")),
      "cohort", "l_orderkey", "cat", FleissRaters)

  val qFleissKappaSql: String =
    s"""WITH r AS (SELECT l_orderkey % 2 AS k, l_orderkey AS subj,
       |    CASE WHEN l_quantity <= 17 THEN 'lo'
       |         WHEN l_quantity <= 34 THEN 'mid' ELSE 'hi' END AS cat
       |  FROM lineitem),
       |cnt AS (SELECT k, subj, cat, count(*) AS nij FROM r GROUP BY 1, 2, 3),
       |per AS (SELECT k, subj, sum(nij) AS rr, sum(nij * nij) AS sq
       |  FROM cnt GROUP BY 1, 2),
       |elig AS (SELECT k, subj, sq FROM per WHERE rr = $FleissRaters),
       |exc AS (SELECT k,
       |  CAST(count(*) FILTER (rr <> $FleissRaters) AS BIGINT) AS n_excluded
       |  FROM per GROUP BY 1),
       |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n_subjects,
       |  CAST(sum(sq) AS BIGINT) AS a_sum FROM elig GROUP BY 1),
       |ct AS (SELECT c.k, c.cat, sum(c.nij) AS cj
       |  FROM cnt c JOIN elig e ON c.k = e.k AND c.subj = e.subj
       |  GROUP BY 1, 2),
       |b AS (SELECT k, sum(cj::HUGEINT * cj) AS b_sum FROM ct GROUP BY 1),
       |f AS (SELECT a.k, n_subjects, coalesce(exc.n_excluded, 0) AS n_excluded,
       |  a_sum, CAST(b.b_sum AS DOUBLE) AS b_sum,
       |  CAST(n_subjects AS DOUBLE) * $FleissRaters.0 AS nr
       |  FROM a LEFT JOIN b ON a.k = b.k LEFT JOIN exc ON a.k = exc.k)
       |SELECT k AS cohort, n_subjects,
       |  CAST(n_excluded AS BIGINT) AS n_excluded, a_sum, b_sum,
       |  (CAST(a_sum AS DOUBLE) - nr) / (nr * ${FleissRaters - 1}.0) AS p_bar,
       |  b_sum / (nr * nr) AS p_e,
       |  CASE WHEN b_sum / (nr * nr) < 1.0 THEN
       |    ((CAST(a_sum AS DOUBLE) - nr) / (nr * ${FleissRaters - 1}.0)
       |      - b_sum / (nr * nr)) / (1.0 - b_sum / (nr * nr))
       |  END AS kappa
       |FROM f""".stripMargin

  // -------------------------------------------------- mantel-haenszel
  // Confounder-safe pooled odds: deep-discount → returned-line odds
  // ratio pooled over order-priority strata — per-stratum ad/n and
  // bc/n as integral micro terms, integer sums, one final division.
  def qMantelHaenszel(s: SparkSession, dir: String): DataFrame =
    Stats.mantelHaenszel(
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          when(col("l_discount") >= 0.05, 1L).otherwise(0L).as("exposed"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("outcome")),
      "o_orderpriority", "exposed", "outcome")

  val qMantelHaenszelSql: String =
    """WITH r AS (
      |  SELECT o_orderpriority AS st,
      |    CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS e,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS o
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |cells AS (SELECT st, count(*) AS n,
      |    count(*) FILTER (e = 1 AND o = 1) AS a,
      |    count(*) FILTER (e = 1 AND o = 0) AS b,
      |    count(*) FILTER (e = 0 AND o = 1) AS c,
      |    count(*) FILTER (e = 0 AND o = 0) AS d
      |  FROM r GROUP BY 1),
      |terms AS (SELECT n,
      |    CAST((1000000::HUGEINT * a * d) // n AS BIGINT) AS ad,
      |    CAST((1000000::HUGEINT * b * c) // n AS BIGINT) AS bc
      |  FROM cells),
      |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |  CAST(sum(n) AS BIGINT) AS n,
      |  CAST(sum(ad) AS BIGINT) AS ad_micro,
      |  CAST(sum(bc) AS BIGINT) AS bc_micro FROM terms)
      |SELECT n_strata, n, ad_micro, bc_micro,
      |  CASE WHEN bc_micro > 0 THEN
      |    CAST(ad_micro AS DOUBLE) / CAST(bc_micro AS DOUBLE)
      |  END AS or_mh
      |FROM agg""".stripMargin

  // -------------------------------------------------------- cramers v
  // Association strength orderstatus↔orderpriority: per-cell χ²
  // contribution as ONE integral micro division of exact integer
  // products, summed as integers (order-independent where
  // chiSquareCells stops at cells), V as one fixed-shape sqrt.
  def qCramersV(s: SparkSession, dir: String): DataFrame =
    Stats.cramersV(t(s, dir, "orders"), "o_orderstatus", "o_orderpriority")

  val qCramersVSql: String =
    """WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
      |    count(*) AS obs
      |  FROM orders
      |  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
      |  GROUP BY 1, 2),
      |rt AS (SELECT a, sum(obs) AS r FROM cells GROUP BY 1),
      |ct AS (SELECT b, sum(obs) AS l FROM cells GROUP BY 1),
      |tot AS (SELECT sum(obs) AS n,
      |  CAST(count(DISTINCT a) AS BIGINT) AS r_dim,
      |  CAST(count(DISTINCT b) AS BIGINT) AS c_dim FROM cells),
      |mic AS (SELECT n, r_dim, c_dim,
      |    CAST((1000000::HUGEINT
      |        * (n::HUGEINT * obs - rt.r::HUGEINT * ct.l)
      |        * (n::HUGEINT * obs - rt.r::HUGEINT * ct.l))
      |      // (n::HUGEINT * rt.r * ct.l) AS BIGINT) AS chi_micro,
      |    CAST((1000000::HUGEINT * rt.r * ct.l) // n AS BIGINT) AS e_micro
      |  FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot),
      |agg AS (SELECT CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(r_dim) AS BIGINT) AS r, CAST(max(c_dim) AS BIGINT) AS c,
      |  CAST(sum(chi_micro)
      |    + (1000000 * max(n) - sum(e_micro)) AS BIGINT) AS chi2_micro
      |  FROM mic)
      |SELECT n, r, c, chi2_micro,
      |  CASE WHEN least(r, c) - 1 > 0 THEN
      |    sqrt(CAST(chi2_micro AS DOUBLE)
      |      / (1000000.0 * CAST(n AS DOUBLE)
      |         * CAST(least(r, c) - 1 AS DOUBLE)))
      |  END AS v
      |FROM agg""".stripMargin

  // ---------------------------------------------------------- kendall
  // Kendall tau-b per nation over suppliers (acctbal vs suppkey):
  // exact pair concordance via the bounded-group self-join (the
  // all-pairs contract — supplier strata are panel-sized), tie counts
  // from per-value groupBys, τ_b one fixed-shape double.
  def qKendall(s: SparkSession, dir: String): DataFrame =
    graft.operators.Robust.kendallByKey(
      t(s, dir, "supplier").withColumn("y_mod", col("s_suppkey") % 100),
      "s_nationkey", "s_suppkey", "s_acctbal", "y_mod")

  val qKendallSql: String =
    """WITH base AS (SELECT s_nationkey AS k, s_suppkey AS id,
      |    s_acctbal AS x, s_suppkey % 100 AS y
      |  FROM supplier
      |  WHERE s_acctbal IS NOT NULL AND s_suppkey IS NOT NULL),
      |p AS (SELECT a.k,
      |    CAST(count(*) FILTER ((a.x < b.x AND a.y < b.y)
      |      OR (a.x > b.x AND a.y > b.y)) AS BIGINT) AS nc,
      |    CAST(count(*) FILTER ((a.x < b.x AND a.y > b.y)
      |      OR (a.x > b.x AND a.y < b.y)) AS BIGINT) AS nd
      |  FROM base a JOIN base b ON a.k = b.k AND a.id < b.id
      |  GROUP BY 1),
      |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1),
      |txc AS (SELECT k, CAST(sum((g * (g - 1)) // 2) AS BIGINT) AS tx
      |  FROM (SELECT k, x, count(*) AS g FROM base GROUP BY 1, 2)
      |  GROUP BY 1),
      |tyc AS (SELECT k, CAST(sum((g * (g - 1)) // 2) AS BIGINT) AS ty
      |  FROM (SELECT k, y, count(*) AS g FROM base GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT nk.k AS s_nationkey, n,
      |  CAST(coalesce(nc, 0) AS BIGINT) AS nc,
      |  CAST(coalesce(nd, 0) AS BIGINT) AS nd, tx, ty,
      |  CASE WHEN CAST(n * (n - 1) AS DOUBLE) / 2.0 - CAST(tx AS DOUBLE)
      |         > 0.0
      |        AND CAST(n * (n - 1) AS DOUBLE) / 2.0 - CAST(ty AS DOUBLE)
      |         > 0.0 THEN
      |    CAST(coalesce(nc, 0) - coalesce(nd, 0) AS DOUBLE)
      |    / (sqrt(CAST(n * (n - 1) AS DOUBLE) / 2.0 - CAST(tx AS DOUBLE))
      |     * sqrt(CAST(n * (n - 1) AS DOUBLE) / 2.0 - CAST(ty AS DOUBLE)))
      |  END AS tau_b
      |FROM nk LEFT JOIN p ON nk.k = p.k
      |  LEFT JOIN txc ON nk.k = txc.k LEFT JOIN tyc ON nk.k = tyc.k"""
      .stripMargin

  // --------------------------------------------------------- theil-sen
  // Robust slope of acctbal over suppkey per nation: the median of
  // pairwise slopes by rank-SELECTION (lower median, deterministic
  // (slope, id, id) tie order) — nothing is summed, so slope and
  // median-residual intercept are engine-exact doubles. Same bounded-
  // group pair-join contract as q_kendall.
  def qTheilSen(s: SparkSession, dir: String): DataFrame =
    graft.operators.Robust.theilSenByKey(t(s, dir, "supplier"),
      "s_nationkey", "s_suppkey", "s_suppkey", "s_acctbal")

  val qTheilSenSql: String =
    """WITH base AS (SELECT s_nationkey AS k, s_suppkey AS id,
      |    CAST(s_suppkey AS DOUBLE) AS x, CAST(s_acctbal AS DOUBLE) AS y
      |  FROM supplier
      |  WHERE s_suppkey IS NOT NULL AND s_acctbal IS NOT NULL),
      |sl AS (SELECT a.k, (b.y - a.y) / (b.x - a.x) AS s,
      |    a.id AS i1, b.id AS i2
      |  FROM base a JOIN base b ON a.k = b.k AND a.id < b.id
      |  WHERE a.x <> b.x),
      |med AS (SELECT k, CAST(m AS BIGINT) AS n_pairs, s AS slope FROM (
      |    SELECT k, s,
      |      row_number() OVER (PARTITION BY k ORDER BY s, i1, i2) AS rn,
      |      count(*) OVER (PARTITION BY k) AS m
      |    FROM sl)
      |  WHERE rn = (m + 1) // 2),
      |res AS (SELECT base.k, n_pairs, slope, id,
      |    y - slope * x AS r
      |  FROM base JOIN med ON base.k = med.k),
      |inter AS (SELECT k, n_pairs, slope, r AS intercept FROM (
      |    SELECT k, n_pairs, slope, r,
      |      row_number() OVER (PARTITION BY k ORDER BY r, id) AS rn,
      |      count(*) OVER (PARTITION BY k) AS m
      |    FROM res)
      |  WHERE rn = (m + 1) // 2),
      |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1)
      |SELECT nk.k AS s_nationkey, n,
      |  CAST(coalesce(inter.n_pairs, 0) AS BIGINT) AS n_pairs,
      |  slope, intercept
      |FROM nk LEFT JOIN inter ON nk.k = inter.k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_theil_sen" -> (qTheilSen _),
    "q_mcnemar" -> (qMcnemar _),
    "q_fleiss_kappa" -> (qFleissKappa _),
    "q_mantel_haenszel" -> (qMantelHaenszel _),
    "q_trimmed_mean" -> (qTrimmedMean _),
    "q_robust_trend" -> (qRobustTrend _),
    "q_psi" -> (qPsi _),
    "q_kappa" -> (qKappa _),
    "q_cramers_v" -> (qCramersV _),
    "q_kendall" -> (qKendall _),
    "q_bh_adjust" -> (qBhAdjust _),
    "q_did" -> (qDid _),
    "q_cuped" -> (qCuped _),
    "q_bootstrap_se" -> (qBootstrapSe _),
    "q_corr_matrix" -> (qCorrMatrix _),
    "q_mannwhitney" -> (qMannWhitney _),
    "q_spearman" -> (qSpearman _),
    "q_scale_features" -> (qScaleFeatures _),
    "q_ks" -> (qKs _),
    "q_gini" -> (qGini _),
    "q_welch" -> (qWelch _),
    "q_corr" -> (qCorr _),
    "q_chisq" -> (qChisq _),
    "q_trend" -> (qTrend _),
    "q_winsorize" -> (qWinsorize _),
    "q_impute" -> (qImpute _),
    "q_paths" -> (qPaths _),
    "q_histogram" -> (qHistogram _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_theil_sen" -> qTheilSenSql,
    "q_mcnemar" -> qMcnemarSql,
    "q_fleiss_kappa" -> qFleissKappaSql,
    "q_mantel_haenszel" -> qMantelHaenszelSql,
    "q_trimmed_mean" -> qTrimmedMeanSql,
    "q_robust_trend" -> qRobustTrendSql,
    "q_psi" -> qPsiSql,
    "q_kappa" -> qKappaSql,
    "q_cramers_v" -> qCramersVSql,
    "q_kendall" -> qKendallSql,
    "q_bh_adjust" -> qBhAdjustSql,
    "q_did" -> qDidSql,
    "q_cuped" -> qCupedSql,
    "q_bootstrap_se" -> qBootstrapSeSql,
    "q_corr_matrix" -> qCorrMatrixSql,
    "q_mannwhitney" -> qMannWhitneySql,
    "q_spearman" -> qSpearmanSql,
    "q_scale_features" -> qScaleFeaturesSql,
    "q_ks" -> qKsSql,
    "q_gini" -> qGiniSql,
    "q_welch" -> qWelchSql,
    "q_corr" -> qCorrSql,
    "q_chisq" -> qChisqSql,
    "q_trend" -> qTrendSql,
    "q_winsorize" -> qWinsorizeSql,
    "q_impute" -> qImputeSql,
    "q_paths" -> qPathsSql,
    "q_histogram" -> qHistogramSql,
  )
}
