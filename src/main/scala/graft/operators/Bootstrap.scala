package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap uncertainty for grouped aggregates (public method:
  * Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
  * 2012; the bag-of-little-bootstraps is the sampled cousin) — standard
  * errors for a mean WITHOUT resampling passes: each row contributes to
  * replicate r with a Poisson(1) weight, all R replicates accumulate in
  * ONE aggregation, and the spread of the replicate means estimates the
  * sampling error of the real mean.
  *
  * Why Poisson: multinomial bootstrap resampling needs the group size up
  * front and a shared draw across the cluster; independent Poisson(1)
  * weights approximate it exactly in the large-n limit and need neither
  * — each row draws alone, so the computation is embarrassingly
  * parallel and ONE corpus pass.
  *
  * Determinism/portability: the weight is a pure function of
  * (row id, replicate) — an md5-derived 32-bit uniform compared against
  * PRECOMPUTED integer CDF thresholds for Poisson(1) (floor(cdf·2³²):
  * integer compares, no float literals) — so reruns, repartitionings
  * and a DuckDB oracle see identical weights. Weighted sums accumulate
  * in exact DECIMAL; each replicate mean is computed in DOUBLE and
  * decimal-rounded before any cross-replicate sum (the repo-wide
  * `q_char_entropy` parity rule — see [[groupedMeanSe]] for the scale
  * choice that keeps the sums exactly double-representable). Numeric
  * contract: group means must satisfy |mean| < 10⁴; rescale the value
  * column upstream otherwise.
  *
  * Scale shape: the replicate explode is R× CPU but NOT R× shuffle —
  * partial aggregation collapses to (groups × R) rows per task before
  * the exchange; the corpus is read once.
  */
object Bootstrap {

  /** floor(CDF_Poisson(1)(k) · 2³²) for k = 0..8; the tail beyond
    * (mass < 1.2e-6) caps at weight 9. */
  private val CdfThresholds = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L,
    4292415291L, 4294609777L, 4294923276L, 4294962463L)

  /** 32-bit uniform from (id, rep): first 8 md5 hex chars as a long —
    * the engine-portable hash rule ([[CountMin]], simhash-md5). */
  private def hash32(id: Column, rep: Column): Column =
    conv(substring(md5(concat_ws(":", id.cast("string"),
      rep.cast("string"))), 1, 8), 16, 10).cast("long")

  /** Deterministic Poisson(1) weight of row `id` in replicate `rep`. */
  def poissonWeight(id: Column, rep: Column): Column = {
    val h = hash32(id, rep)
    CdfThresholds.zipWithIndex.foldRight(lit(CdfThresholds.size): Column) {
      case ((t, k), tail) => when(h < t, lit(k)).otherwise(tail)
    }
  }

  /** Per-(group, replicate) weighted means:
    * (groupCols..., rep, mean_r DECIMAL(20,12)). Replicates whose total
    * weight lands on zero (only plausible for tiny groups) yield NULL
    * and are excluded from the spread. */
  def replicateMeans(df: DataFrame, idCol: String, valueCol: String,
      groupCols: Seq[String], replicates: Int): DataFrame = {
    require(replicates >= 2, s"need >= 2 replicates, got $replicates")
    val prepared = df.filter(col(valueCol).isNotNull)
      .select((Seq(col(idCol).as("__id"),
        col(valueCol).cast("decimal(18,6)").as("__x")) ++
        groupCols.map(col)): _*)
      .select(col("*"),
        explode(sequence(lit(0), lit(replicates - 1))).as("rep"))
      .withColumn("__w", poissonWeight(col("__id"), col("rep")))
    prepared
      .groupBy((groupCols.map(col) :+ col("rep")): _*)
      .agg(
        sum(col("__w") * col("__x")).as("__wx"),
        sum(col("__w").cast("long")).as("__wsum"))
      .select((groupCols.map(col) :+ col("rep") :+
        when(col("__wsum") > 0,
          (col("__wx").cast("double") / col("__wsum").cast("double"))
            .cast("decimal(20,12)"))
          .as("mean_r")): _*)
  }

  /** Grouped mean with its bootstrap standard error:
    * (groupCols..., n, mean_val, se_boot, r_used). The spread is the
    * sample standard deviation of the replicate means. Numeric
    * portability detail: the mean and its square are rounded
    * DECIMAL(20,6) — NOT (20,12) — before the cross-replicate sums, so
    * the summed scaled integers stay below 2⁵³ and the closing
    * decimal→double casts are exactly representable on BOTH engines
    * (at scale 12 the sum of squares lands near 10¹⁷ scaled, where
    * DuckDB's int128→double conversion double-rounds against Spark's
    * correctly-rounded BigDecimal and the last digits diverge — found
    * empirically by this query's own oracle). The 1e-6 quantization
    * perturbs the SE by ≤ ~1e-4 relative — far below the bootstrap's
    * own Monte-Carlo error. */
  def groupedMeanSe(df: DataFrame, idCol: String, valueCol: String,
      groupCols: Seq[String], replicates: Int): DataFrame = {
    val reps = replicateMeans(df, idCol, valueCol, groupCols, replicates)
      .filter(col("mean_r").isNotNull)
      .withColumn("__m", col("mean_r").cast("double"))
      .withColumn("__m6", col("__m").cast("decimal(20,6)"))
      .withColumn("__m2",
        (col("__m") * col("__m")).cast("decimal(20,6)"))
    val spread = reps
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("r_used"),
        sum(col("__m6")).as("__s"),
        sum(col("__m2")).as("__ss"))
      .select((groupCols.map(col) :+ col("r_used") :+
        when(col("r_used") > 1, sqrt(greatest(lit(0.0),
          (col("__ss").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") /
              col("r_used").cast("double")) /
            (col("r_used").cast("double") - 1.0))))
          .as("se_boot")): _*)
    val base = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (sum(col(valueCol).cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_val"))
    // ungrouped case: both sides are one row — a scalar cross join
    val joined =
      if (groupCols.isEmpty) base.crossJoin(spread)
      else base.join(spread, groupCols)
    joined.select((groupCols.map(col) :+ col("n") :+ col("mean_val") :+
      col("se_boot") :+ col("r_used")): _*)
  }

  /** Paired sign-flip permutation test (Fisher randomization on matched
    * pairs): is the mean paired difference zero? Under H₀ each pair's
    * difference is symmetric around 0, so every sign assignment is
    * equally likely — replicate r flips the sign of pair `id` by the
    * parity of the same md5 32-bit hash the Poisson bootstrap draws
    * from, and p = (1 + #{r : |T_r| ≥ |T_obs|}) / (R + 1) (the
    * add-one Monte-Carlo estimator, never exactly 0).
    *
    * EXACT end to end: differences quantize to cents, every replicate
    * statistic T_r = Σ ±d_i is an integral DECIMAL(38,0) sum, and the
    * extremity comparison |T_r| ≥ |T_obs| is an integer compare — no
    * float enters until the closing p division. Rows with a null id or
    * null difference are dropped (a null id has no deterministic sign
    * in any replicate — the [[EpochShuffle]] rule).
    *
    * Scale shape: one corpus pass for T_obs, one R-fold explode pass
    * collapsed by partial aggregation to R rows before the exchange
    * (the [[replicateMeans]] shape); the replicate table then reduces
    * against the broadcast observed statistic. Output (one row):
    * n_pairs, t_obs, r, n_extreme, p_value. */
  def pairedSignPermutation(df: DataFrame, idCol: String,
      diffCol: String, replicates: Int,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(replicates >= 2, s"need >= 2 replicates, got $replicates")
    // the pair table feeds T_obs AND the replicate explode — retained so
    // the source scan + quantization runs once, not per consumer
    val pairs = scope.retain(df
      .filter(col(idCol).isNotNull && col(diffCol).isNotNull)
      .select(col(idCol).as("__id"),
        (col(diffCol).cast("decimal(18,2)") * 100).cast("long").as("__dm")))
    val obs = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(col("__dm").cast("decimal(38,0)")).as("__tobs"))
    val reps = pairs
      .select(col("*"),
        explode(sequence(lit(0), lit(replicates - 1))).as("rep"))
      .withColumn("__sgn",
        when(hash32(col("__id"), col("rep")) % 2 === 0, lit(1L))
          .otherwise(lit(-1L)))
      .groupBy(col("rep"))
      .agg(sum((col("__dm") * col("__sgn")).cast("decimal(38,0)"))
        .as("__tr"))
    val extreme = reps.crossJoin(broadcast(obs))
      .agg(sum(when(abs(col("__tr")) >= abs(col("__tobs")), 1L)
        .otherwise(0L)).as("n_extreme"))
    obs.crossJoin(broadcast(extreme))
      .select(col("n_pairs"),
        (LinearModel.intMomentToDouble(col("__tobs"), 1.0) / lit(100.0))
          .as("t_obs"),
        lit(replicates).as("r"),
        col("n_extreme"),
        ((col("n_extreme").cast("double") + lit(1.0)) /
          lit(replicates + 1.0)).as("p_value"))
  }
}
