package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for release/training pipelines: k-anonymity
  * equivalence classes (Sweeney 2002), l-diversity homogeneity checks
  * (Machanavajjhala et al. 2007), and epsilon-DP noisy counts via the
  * Laplace mechanism (Dwork et al. 2006).
  *
  * Beyond-reference family: fastETL ships PII-bearing government tables
  * between databases (e.g. `fastetl/custom_functions/utils/` load
  * helpers move citizen records verbatim); before such a table — or a
  * 100 TB behavioral corpus — is released for analytics or training,
  * the releasing pipeline needs to MEASURE re-identification risk and,
  * where aggregates are published, add calibrated noise. These
  * operators are that audit stage, expressed as plain aggregations so
  * Catalyst keeps them one shuffle each.
  *
  * Scale shape: every entry point is a single groupBy over the quasi
  * columns — partial aggregation map-side, one keyed exchange, output
  * bounded by |distinct quasi tuples| (the whole point of
  * quasi-identifiers is that this is far below |rows|). The DP noise is
  * derived post-aggregation from an md5 of the group key itself, so it
  * adds zero shuffles and is reproducible across reruns and engines.
  *
  * Determinism caveat (documented contract): `dpCounts` draws its
  * Laplace noise from a seeded md5 — reproducible by design so releases
  * are auditable and the DuckDB oracle can replay them. The MECHANISM
  * (inverse-CDF Laplace at sensitivity 1) is the real thing; a
  * production release against an adaptive adversary should swap the
  * seed for fresh entropy per release.
  */
object Privacy {

  /** 2^48 — the md5-derived uniform uses 12 hex chars (48 bits), which a
    * DOUBLE holds exactly (53-bit mantissa); dividing by a power of two
    * only shifts the exponent, so `u` is bit-identical on any IEEE
    * engine. */
  val Pow2_48: Double = 281474976710656.0

  /** Per-equivalence-class sizes over the quasi-identifier columns:
    * one row per distinct quasi tuple with its population `k`. A class
    * with small k is a re-identification handle — anyone who knows a
    * target's quasi values can narrow them to k candidates. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String]): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("k"))

  /** One-row re-identification risk report: class count, row count,
    * the smallest class (the table's k-anonymity), and how many rows
    * sit in classes below `kMin`. `pct_at_risk` is one IEEE division of
    * two exactly-representable integers — bit-identical on any engine,
    * no decimal rounding step needed. */
  def riskReport(df: DataFrame, quasiCols: Seq[String], kMin: Long): DataFrame =
    kAnonymity(df, quasiCols)
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("k")).as("n_rows"),
        min(col("k")).as("min_k"),
        sum(when(col("k") < kMin, col("k")).otherwise(lit(0L)))
          .as("rows_at_risk"))
      .withColumn("pct_at_risk",
        (col("rows_at_risk") * lit(100L)).cast("double") /
          col("n_rows").cast("double"))

  /** l-diversity per quasi class: `l` = distinct sensitive values seen
    * in the class, alongside its size `k`. A class with l = 1 leaks the
    * sensitive value of every member even when k is large (homogeneity
    * attack) — `diverse` flags classes meeting the `lMin` bar. Exact
    * distinct is the two-phase partial/final aggregate; for corpora
    * where |sensitive| per class is itself huge, feed a bucketed
    * sensitive column (the attack model only cares about
    * distinguishable values). */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      lMin: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("k"),
        countDistinct(col(sensitiveCol)).as("l"))
      .withColumn("diverse", col("l") >= lit(lMin))

  /** t-closeness per quasi class (Li, Li & Venkatasubramanian, ICDE
    * 2007) — the third leg of the anonymity trio: a class can be
    * k-anonymous AND l-diverse yet still leak when its sensitive-value
    * DISTRIBUTION diverges from the table's (skewness attack). For a
    * categorical sensitive attribute the prescribed distance is
    * variational: t = ½·Σᵢ|p(i|class) − q(i)|.
    *
    * Computed EXACTLY in integers over a common denominator:
    * |n_ic·N − N_i·n_c| summed per class, then one fixed-point ppm
    * division by 2·n_c·N — no float distributions anywhere, so the
    * oracle replays it bit-for-bit. Shape at scale: one corpus groupBy
    * on (quasi…, sensitive); everything after operates on class×value
    * aggregate rows (global totals ride a broadcast one-row/|V|-row
    * join). Long products hold exactly for corpora under ~3·10⁹ rows
    * (n_ic·N < 2⁶³); beyond that pre-aggregate per shard or widen the
    * counts to DECIMAL (the [[graft.similarity.Centroids]] mass-bound
    * convention). Output per class: k (class size), t_ppm, `close` =
    * t_ppm <= tMaxPpm. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tMaxPpm: Long): DataFrame = {
    val cells = df
      .filter(col(sensitiveCol).isNotNull)
      .groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("n_ic"))
    val classes = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("n_ic")).as("n_c"))
    val globals = cells.groupBy(col(sensitiveCol))
      .agg(sum(col("n_ic")).as("n_i"))
    val total = globals.agg(sum(col("n_i")).as("n_tot"))
    // the class × sensitive grid must include values ABSENT from a
    // class (they still contribute N_i·n_c to the distance): cross the
    // class list with the (broadcast, |V|-sized) global value list —
    // |V| is sensitive-value cardinality, small by the same bucketing
    // contract as lDiversity
    val grid = classes
      .crossJoin(broadcast(globals))
      .join(cells, quasiCols :+ sensitiveCol, "left")
      .na.fill(0L, Seq("n_ic"))
      .crossJoin(broadcast(total))
    grid
      .groupBy(quasiCols.map(col): _*)
      .agg(
        max(col("n_c")).as("k"),
        max(col("n_tot")).as("n_tot"),
        sum(abs(col("n_ic") * col("n_tot") - col("n_i") * col("n_c")))
          .as("num"))
      .withColumn("t_ppm", expr("(num * 1000000L) div (2L * k * n_tot)"))
      .withColumn("close", col("t_ppm") <= lit(tMaxPpm))
      .select(quasiCols.map(col) ++
        Seq(col("k"), col("t_ppm"), col("close")): _*)
  }

  /** Deterministic Laplace(1/epsilon) noise for a group key: inverse
    * CDF over a 48-bit md5 uniform. u in [0,1); X = -sign(u-1/2) *
    * ln(1-2|u-1/2|) / epsilon. The 1e-12 floor guards the measure-zero
    * u=0 edge (ln 0) identically on both engines. */
  def laplaceNoise(key: Column, epsilon: Double, seed: Long): Column = {
    val u = conv(substring(md5(concat(key, lit(s":dp:$seed"))), 1, 12),
      16, 10).cast("double") / lit(Pow2_48)
    val c = u - lit(0.5)
    -signum(c) * log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(c))) /
      lit(epsilon)
  }

  /** Epsilon-DP noisy histogram: per-group counts plus Laplace noise at
    * sensitivity 1 (one individual moves one count by one). The noise
    * attaches AFTER aggregation, keyed on the group value itself —
    * zero extra shuffles, reproducible per (group, seed). The noisy
    * count rounds through DECIMAL(28,6) so the reported double renders
    * identically across engines (ln differs at ulp level between libm
    * implementations — NOTES parity rule 4). */
  def dpCounts(df: DataFrame, groupCol: String, epsilon: Double,
      seed: Long): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("n_noisy",
        (col("n_true") + laplaceNoise(col(groupCol).cast("string"), epsilon,
          seed)).cast("decimal(28,6)").cast("double"))

  /** Keyed deterministic pseudonymization: replace `c` with a stable
    * surrogate token md5(secret ':' value) — the same value maps to the
    * same token under the same secret EVERYWHERE, so joins and
    * referential integrity survive tokenization across tables while
    * the raw identifier never leaves the pipeline. Map-side expression,
    * zero shuffles, composable per column.
    *
    * Threat model (document to callers): this is pseudonymization
    * (GDPR art. 4(5)) — reversible by whoever holds the secret via
    * re-derivation, and vulnerable to dictionary attack on low-entropy
    * values if the secret leaks. NULL stays NULL (a null identifier is
    * absence, not a value to protect). */
  def pseudonymize(df: DataFrame, c: String, secret: String): DataFrame =
    df.withColumn(c, md5(concat(lit(s"$secret:"), col(c).cast("string"))))

  /** Generalize rare quasi-identifier classes to reach k-anonymity:
    * rows whose full quasi tuple has population < kMin get every quasi
    * column replaced by `otherLabel` — coarse, monotone (suppressing
    * can only merge classes, never split), and sufficient whenever the
    * merged OTHER class itself reaches kMin (flagged in the output so
    * callers can iterate or drop the remainder).
    *
    * One aggregation on the quasi tuple + one broadcast-sized join of
    * the RARE class list back (bounded by kMin x classes, the small
    * side by construction). String quasi columns only — generalizing
    * numerics belongs to binning ([[Discretize]]) upstream. */
  def suppressRare(df: DataFrame, quasiCols: Seq[String], kMin: Long,
      otherLabel: String = "OTHER"): DataFrame = {
    quasiCols.foreach { c =>
      require(df.schema(c).dataType ==
        org.apache.spark.sql.types.StringType,
        s"suppressRare quasi column '$c' must be string — bin numerics " +
          "upstream (Discretize) so generalization is meaningful")
    }
    val rare = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") < kMin)
      .select(quasiCols.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__rare", lit(true))
    val joinCond = quasiCols.map(c => col(c) <=> col(s"__r_$c"))
      .reduce(_ && _)
    val joined = df.join(broadcast(rare), joinCond, "left")
    quasiCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(col("__rare"), lit(otherLabel)).otherwise(col(c)))
    }.drop((quasiCols.map(c => s"__r_$c") :+ "__rare"): _*)
  }
}
