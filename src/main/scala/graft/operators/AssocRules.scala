package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (support / confidence / lift) over
  * pairwise co-occurrence — the classic cross-sell / co-purchase miner,
  * and for corpus work a document-level token-association screen.
  *
  * Pipeline: distinct (basket, item) pairs → per-basket self-join with
  * `itemA < itemB` (pair work is Σ C(k,2) over basket sizes — bounded by
  * the largest basket, never by corpus size, and the join shuffles on
  * the basket key so co-baskets are co-located) → pair counts filtered
  * by `minPairs` BEFORE the wide rule expansion → both rule directions
  * union'd → broadcast joins against the item-count table and the
  * one-row basket total.
  *
  * Metrics are single double divisions / multiplications of exact
  * BIGINT counts (fixed shape — engine-reproducible):
  * `support = n_ab / n_baskets`, `confidence = n_ab / n_antecedent`,
  * `lift = (n_ab · n_baskets) / (n_antecedent · n_consequent)`.
  */
object AssocRules {

  /** Returns (antecedent, consequent, n_pair, n_ante, n_cons, n_baskets,
    * support, confidence, lift), both directions per surviving pair. */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairs: Long): DataFrame = {
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val itemCounts = items.groupBy(col("i")).agg(count(lit(1)).as("n_item"))
    val baskets = items.agg(count_distinct(col("b")).as("n_baskets"))
    val pairs = items.alias("l")
      .join(items.alias("r"), col("l.b") === col("r.b") &&
        col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("ia"), col("r.i").as("ib"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairs)
    val directed = pairs
      .select(col("ia").as("antecedent"), col("ib").as("consequent"),
        col("n_pair"))
      .unionByName(pairs.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("n_pair")))
    directed
      .join(broadcast(itemCounts.select(col("i"), col("n_item").as("n_ante"))),
        col("antecedent") === col("i")).drop("i")
      .join(broadcast(itemCounts.select(col("i"), col("n_item").as("n_cons"))),
        col("consequent") === col("i")).drop("i")
      .crossJoin(broadcast(baskets))
      .select(col("antecedent"), col("consequent"),
        col("n_pair"), col("n_ante"), col("n_cons"), col("n_baskets"),
        (col("n_pair").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_pair").cast("double") / col("n_ante").cast("double"))
          .as("confidence"),
        (col("n_pair").cast("double") * col("n_baskets").cast("double") /
          (col("n_ante").cast("double") * col("n_cons").cast("double")))
          .as("lift"))
  }
}
