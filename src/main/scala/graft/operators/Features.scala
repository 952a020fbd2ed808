package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tabular feature engineering for model training — the last-mile
  * transforms between a curated corpus and a training matrix.
  */
object Features {

  /** Hashing-trick text featurization: tokens hash into `dims` buckets
    * with a ±1 sign bit (Weinberger et al.'s signed feature hashing —
    * the sign makes collision noise zero-mean), giving a fixed-width
    * sparse representation with NO vocabulary state: no dictionary to
    * build, broadcast, or keep consistent across training shards — the
    * property that makes this the featurizer that survives streaming
    * ingest and 100 TB corpora unchanged. Engine-portable: bucket =
    * first-6-md5-hex fold of the token mod dims (Sampling.hashBucket's
    * idiom), sign = parity of the 7th hex char. Output: one row per
    * (id, non-empty bucket) with the signed count sum — zero-sum
    * buckets from exact ± cancellation are kept (they are observations,
    * not absences). */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame = {
    require(dims >= 1, s"need dims >= 1, got $dims")
    val terms = df.select(col(idCol),
        explode(split(graft.functions.TextFunctions.normalize(col(textCol)),
          " ")).as("__term"))
      .filter(col("__term") =!= "")
    val bucket = Sampling.hashBucket(col("__term"), dims)
    val sign = when(
      conv(substring(md5(col("__term")), 7, 1), 16, 10).cast("long") % 2
        === 0, lit(1L)).otherwise(lit(-1L))
    terms
      .select(col(idCol), bucket.as("bucket"), sign.as("__s"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__s")).as("weight"))
  }

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
