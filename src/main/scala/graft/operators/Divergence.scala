package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Jensen-Shannon divergence of each group's token distribution against
  * the whole corpus — the bounded, symmetric drift score ([0, ln 2])
  * curation pipelines use to answer "which source/snapshot no longer
  * looks like the corpus?" (KL alone is unbounded and undefined on
  * unseen tokens; JS's mixture midpoint absorbs both).
  *
  * Relational shape: one tokenize pass → per-(group, term) and per-term
  * count tables, then a term-keyed join — the vocabulary is never
  * broadcast or collected, and the per-group output is group-sized.
  *
  * Exactness contract (the PMI treatment): probabilities are doubles
  * from exact integer counts via fixed-shape divisions, each term's JS
  * contribution `0.5·p·ln(p/m) + 0.5·q·ln(q/m)` is rounded into
  * DECIMAL(20,12) (ln is the one non-correctly-rounded op; the waypoint
  * hides last-ulp libm differences), and the per-group sum of decimals
  * is order-independent. Terms absent from a group contribute only
  * their q arm (the p·ln(p) → 0 limit), guarded explicitly so no
  * 0 · (−∞) NaN can leak in.
  */
object Divergence {

  /** (group, n_tokens, js_div) for every non-null group. */
  def jsAgainstCorpus(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val terms = docs
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(split(TextFunctions.normalize(col(textCol)), " "))
          .as("term"))
      .filter(col("term") =!= "")
    val perGroup = terms.groupBy(col("g"), col("term"))
      .agg(count(lit(1)).as("c_gt"))
    val perTerm = perGroup.groupBy(col("term"))
      .agg(sum(col("c_gt")).as("c_t"))
    val groupTotals = perGroup.groupBy(col("g"))
      .agg(sum(col("c_gt")).as("n_g"))
    val corpusTotal = perTerm.agg(sum(col("c_t")).as("n"))

    // every (group, corpus term) pair: the vocabulary-sized term table
    // stays partitioned; the group-sized totals broadcast onto it. The
    // LEFT join brings in the group's own counts (absent terms → null).
    val pairs = perTerm.crossJoin(broadcast(corpusTotal))
      .crossJoin(broadcast(groupTotals))
      .join(perGroup, Seq("g", "term"), "left")
    val p = col("c_gt").cast("double") / col("n_g").cast("double")
    val q = col("c_t").cast("double") / col("n").cast("double")
    val m = (p + q) / lit(2.0)
    // q > 0 always (the term exists in the corpus); p may be absent
    val contrib = when(col("c_gt").isNull,
        lit(0.5) * q * log(q / (q / lit(2.0))))
      .otherwise(lit(0.5) * p * log(p / m) + lit(0.5) * q * log(q / m))
    pairs
      .select(col("g"), contrib.cast("decimal(20,12)").as("contrib"),
        col("n_g"))
      .groupBy(col("g"))
      .agg(max(col("n_g")).as("n_tokens"),
        sum(col("contrib")).cast("double").as("js_div"))
      .withColumnRenamed("g", groupCol)
  }
}
