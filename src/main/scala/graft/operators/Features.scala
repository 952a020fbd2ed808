package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tabular feature engineering for model training — the last-mile
  * transforms between a curated corpus and a training matrix.
  */
object Features {

  /** Lag-feature matrix: `lag_1..lag_k` of `valueCol` per key in
    * (ts, tie) order — the autoregressive feature block, k columns from
    * ONE per-key sort-shuffle (every lag shares the window). Leading
    * rows hold nulls (no fabricated history). */
  def lagMatrix(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    (1 to k).foldLeft(df) { (d, j) =>
      d.withColumn(s"lag_$j", lag(col(valueCol), j).over(w))
    }
  }

  /** Leave-one-out target encoding: each row's category feature is the
    * mean target of its category EXCLUDING the row itself —
    * `(S_cat - x) / (n_cat - 1)` — the standard guard against the
    * self-leakage that plain mean encoding injects (a rare category
    * would otherwise memorize its own label). Engine-exact: S is a
    * decimal partial sum, the subtraction is decimal, and the single
    * closing division is one correctly-rounded double op
    * (the Stats contract). Categories with one row (or a null target)
    * encode null; callers fill with a prior downstream. */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
      outCol: String = "te_loo"): DataFrame = {
    val d = col(targetCol).cast("decimal(18,2)")
    val stats = df
      .filter(col(catCol).isNotNull && col(targetCol).isNotNull)
      .groupBy(col(catCol))
      .agg(sum(d).as("__s"), count(lit(1)).as("__n"))
    df.join(broadcast(stats), Seq(catCol), "left")
      .withColumn(outCol,
        when(col(targetCol).isNotNull && col("__n") > 1,
          (col("__s") - d).cast("double") /
            (col("__n") - 1).cast("double")))
      .drop("__s", "__n")
  }
}
