package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-scale statistical laws — the macro health checks of a
  * training corpus: a natural-language corpus follows Zipf's law
  * (frequency ∝ rank^(−s), s ≈ 1); a corpus of boilerplate, templated,
  * or machine-generated text bends away from it. The fitted exponent
  * is the one-number drift alarm for ingestion pipelines (compare per
  * snapshot / per source), complementing the per-document quality
  * scores in [[QualityFilter]].
  *
  * Engine-exactness: token counts are exact integers; ln(rank) and
  * ln(freq) are quantized to integral micro-nats via floor(1e6·ln x)
  * (one call per distinct vocab entry — the bounded-domain ln
  * contract), the OLS moments over the vocab table sum in
  * DECIMAL(38,0), and the closing slope/intercept formulas are
  * fixed-shape doubles through the 2^53 hi/lo split.
  *
  * Scale shape: one corpus scan to token counts (map-side combined),
  * one vocab-sized rank window, one scalar aggregate. The rank sort is
  * vocab-bounded, not corpus-bounded — the corpus never sorts.
  */
object CorpusLaws {

  private def i38(c: Column) = c.cast("decimal(38,0)")
  private def dv(c: Column) = LinearModel.intMomentToDouble(c, 1.0)

  private def lnMicro(c: Column): Column =
    floor(log(c.cast("double")) * lit(1e6)).cast("long")

  /** (tok, c) corpus token counts over the normalized whitespace
    * tokenization — one scan, map-side combined. */
  private def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(TextFunctions.normalize(col(textCol)), " "))
        .as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))

  /** Zipf fit over the top-`topV` vocabulary: regress ln(freq) on
    * ln(rank) (rank by freq desc, token asc — total order, engine
    * independent). Returns one row: vocab (full distinct-token count),
    * n_tokens, v_used (min(topV, vocab) entries fitted), slope (the
    * negated Zipf exponent; ≈ −1 for natural text), intercept
    * (ln-frequency at rank 1 under the fit). Slope/intercept null when
    * fewer than 2 vocab entries survive.
    *
    * Ranks start at 1, so ln(rank) ≥ 0 and the fit is anchored at the
    * head — the standard Zipf regression convention; callers studying
    * the tail pass a larger topV. */
  def zipfFit(docs: DataFrame, textCol: String, topV: Int,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(topV >= 2, s"topV must be >= 2, got $topV")
    // the vocab table feeds the rank fit AND the corpus totals —
    // retained so the corpus tokenize+count pass runs once
    val counts = scope.retain(tokenCounts(docs, textCol))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("tok"))
    val top = counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topV)
      .select(lnMicro(col("rank")).as("x"), lnMicro(col("c")).as("y"))
    val moments = top.agg(
      count(lit(1)).as("v_used"),
      sum(i38(col("x"))).as("sx"),
      sum(i38(col("y"))).as("sy"),
      sum(i38(col("x")) * col("y")).as("sxy"),
      sum(i38(col("x")) * col("x")).as("sxx"))
    val totals = counts.agg(
      count(lit(1)).as("vocab"),
      sum(i38(col("c"))).as("n_tokens"))
    val n = col("v_used").cast("double")
    val sx = dv(col("sx"))
    val sy = dv(col("sy"))
    val sxy = dv(col("sxy"))
    val sxx = dv(col("sxx"))
    val denom = n * sxx - sx * sx
    // x and y are both micro-nats: the 1e6 unit cancels in the slope;
    // the intercept needs one /1e6 back to nats
    val slope = (n * sxy - sx * sy) / denom
    val intercept = ((sy - slope * sx) / n) / lit(1e6)
    totals.crossJoin(broadcast(moments))
      .select(col("vocab"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("v_used"),
        when(col("v_used") >= 2 && denom > 0.0, slope).as("slope"),
        when(col("v_used") >= 2 && denom > 0.0, intercept).as("intercept"))
  }

  /** Simple Good–Turing frequency-of-frequencies (Good 1953; the
    * smoothing table behind KN-style discounts and the classic
    * unseen-mass estimate): for each observed token frequency r, the
    * type count N_r, the adjusted count r* = (r+1)·N_{r+1}/N_r (null
    * at gaps/tail, where simple GT is undefined and callers switch to
    * the Zipf-smoothed fit), and the corpus mass share r·N_r/N. Row
    * r = 1's mass IS the leave-one-out unseen-mass estimate P₀.
    *
    * All inputs to the closing double formulas are exact integer
    * counts; the frequency-of-frequency table is bounded by the
    * distinct-frequency count (≤ O(√tokens)), so its windows never see
    * corpus-sized frames. Output: r, n_r, r_star, mass. */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame = {
    val fof = tokenCounts(docs, textCol)
      .groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
    val wNext = org.apache.spark.sql.expressions.Window.orderBy(col("r"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val t = fof
      .withColumn("rn", lead(col("r"), 1).over(wNext))
      .withColumn("nn", lead(col("n_r"), 1).over(wNext))
      .withColumn("n", sum(i38(col("r")) * col("n_r")).over(wAll))
    t.select(col("r"), col("n_r"),
      when(col("rn") === col("r") + 1,
        (col("r") + 1).cast("double") * col("nn").cast("double") /
          col("n_r").cast("double")).as("r_star"),
      // r·N_r and N can pass 2^53 on a 10^12-token corpus — both ride
      // the engine-neutral hi/lo split before the double division
      (dv(i38(col("r")) * col("n_r")) / dv(col("n"))).as("mass"))
  }
}
