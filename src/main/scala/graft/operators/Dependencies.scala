package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dependency profiling: exact functional-dependency checks (A → B)
  * and candidate-key verification over configured column (sets) — the
  * schema-inference half of data profiling (Papenbrock et al.'s FD
  * discovery problem, VLDB 2015, restricted to a caller-given
  * hypothesis list — the exhaustive lattice search is a driver-side
  * planning loop over THIS primitive).
  *
  * fastETL's load pipelines assume key/dependency contracts implicitly
  * (merge keys, dedup keys, DDL synthesis); these operators make the
  * contract checkable before a 100 TB load, not after it corrupts a
  * merge.
  *
  * Shape at scale: ONE corpus scan for all hypotheses — each row
  * explodes into one small struct per hypothesis (CPU, not shuffle:
  * partial aggregation collapses duplicates map-side), then two keyed
  * reductions whose output is bounded by distinct value counts, never
  * row counts. All outputs are exact integers/booleans — bit-portable
  * by construction.
  *
  * Values are compared through their string rendering WITHIN a column
  * (null kept as a real group) — renders are only compared to renders
  * of the same column, so cross-type collisions cannot arise. */
object Dependencies {

  /** Check A → B for each (lhs, rhs) pair. Output per pair: n_lhs_values
    * (distinct LHS incl. null), n_pairs (distinct (LHS, RHS) combos),
    * n_lhs_violating (LHS values mapping to >1 RHS), fd_holds. */
  def functionalDeps(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "no FD hypotheses given")
    val branches = pairs.map { case (a, b) =>
      struct(lit(a).as("lhs"), lit(b).as("rhs"),
        col(a).cast("string").as("lv"), col(b).cast("string").as("rv"))
    }
    df.select(explode(array(branches: _*)).as("h"))
      .select(col("h.lhs"), col("h.rhs"), col("h.lv"), col("h.rv"))
      .groupBy(col("lhs"), col("rhs"), col("lv"), col("rv"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("lhs"), col("rhs"), col("lv"))
      .agg(count(lit(1)).as("__n_rhs"))
      .groupBy(col("lhs"), col("rhs"))
      .agg(
        count(lit(1)).as("n_lhs_values"),
        sum(col("__n_rhs")).as("n_pairs"),
        sum(when(col("__n_rhs") > 1L, 1L).otherwise(0L))
          .as("n_lhs_violating"))
      .withColumn("fd_holds", col("n_lhs_violating") === 0L)
  }

  /** Verify candidate keys: for each column set, is (c1..ck) unique?
    * Output per set: key_cols (comma-joined label), n_rows, n_distinct,
    * n_dup_rows (rows sharing a key with another row), is_key. */
  def keyCheck(df: DataFrame, keySets: Seq[Seq[String]]): DataFrame = {
    require(keySets.nonEmpty && keySets.forall(_.nonEmpty),
      "need non-empty key sets")
    val branches = keySets.map { cols =>
      struct(lit(cols.mkString(",")).as("key_cols"),
        array(cols.map(c => col(c).cast("string")): _*).as("kv"))
    }
    df.select(explode(array(branches: _*)).as("h"))
      .select(col("h.key_cols"), col("h.kv"))
      .groupBy(col("key_cols"), col("kv"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("key_cols"))
      .agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("__n") > 1L, col("__n")).otherwise(0L))
          .as("n_dup_rows"))
      .withColumn("is_key", col("n_dup_rows") === 0L)
  }
}
