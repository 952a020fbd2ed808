package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite (dbt-tests / Great
  * Expectations style), compiled into ONE aggregation pass over the
  * table.
  *
  * The reference ships QA as ad-hoc per-column probes (CPF check digits,
  * geo validity ranges — custom_functions.py quality helpers, replicated
  * in graft.clean); this generalizes them into a declarative suite: the
  * caller states constraints, the engine folds every row-level check into
  * conditional counts inside a single `agg` (one scan, one reduce — at
  * 100 TB the scan dominates, so N checks cost the same as one), then
  * unpivots to a long-form report `(check, violations, total, passed)`.
  *
  * `Unique` rides the same aggregate as a `count_distinct` (Catalyst
  * plans the mixed distinct/non-distinct aggregate with one Expand over
  * the single scan — still no second pass over storage). Referential
  * integrity (`foreignKey`) necessarily reads a second table; it is a
  * broadcast-shaped anti-join count appended as one more report row.
  *
  * All counts are BIGINT; no doubles anywhere — the report is exactly
  * reproducible on any engine.
  */
object Expectations {

  sealed trait Check { def name: String }

  /** Violation: column is NULL. */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null:$column"
  }

  /** Violation: a non-null key tuple occurs more than once. Counted as
    * the number of surplus rows (`count(keys) - count(DISTINCT keys)`
    * over rows where no key part is null — dbt's `unique` semantics). */
  final case class Unique(columns: Seq[String]) extends Check {
    require(columns.nonEmpty, "Unique needs at least one column")
    val name = s"unique:${columns.mkString(",")}"
  }

  /** Violation: non-null value outside [lo, hi]. */
  final case class InRange(column: String, lo: Column, hi: Column)
      extends Check {
    val name = s"in_range:$column"
  }

  /** Violation: non-null value not in the accepted set. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Check {
    require(values.nonEmpty, "AcceptedValues needs a non-empty set")
    val name = s"accepted_values:$column"
  }

  /** Violation: non-null value does not match the regex. Keep patterns in
    * the portable subset (character classes, anchors, quantifiers) if the
    * suite must agree across engines. */
  final case class Matches(column: String, pattern: String) extends Check {
    val name = s"matches:$column"
  }

  private def violations(c: Check): Column = c match {
    case NotNull(col0) =>
      count_if(col(col0).isNull)
    case Unique(cols0) =>
      val noNulls = cols0.map(col(_).isNotNull).reduce(_ && _)
      count_if(noNulls) -
        count_distinct(when(noNulls, struct(cols0.map(col): _*)))
    case InRange(col0, lo, hi) =>
      count_if(col(col0).isNotNull && (col(col0) < lo || col(col0) > hi))
    case AcceptedValues(col0, vals) =>
      count_if(col(col0).isNotNull && !col(col0).isin(vals: _*))
    case Matches(col0, p) =>
      count_if(col(col0).isNotNull && !col(col0).rlike(p))
  }

  /** Run the suite: one aggregation pass producing one report row per
    * check — `(check STRING, violations BIGINT, total BIGINT,
    * passed BOOLEAN)`. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names in suite")
    val aggCols = count(lit(1)).as("__total") +:
      checks.zipWithIndex.map { case (c, i) => violations(c).as(s"__v$i") }
    val wide = df.agg(aggCols.head, aggCols.tail: _*)
    // Unpivot the single wide row to long form: stack(n, name0, v0, ...).
    val pairs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c.name), col(s"__v$i"))
    }
    wide.select(
        stack((lit(checks.size) +: pairs): _*).as(Seq("check", "violations")),
        col("__total").as("total"))
      .withColumn("passed", col("violations") === 0L)
  }

  /** Referential-integrity report row: rows of `df` whose non-null
    * `fkCol` has no match in `dim.pkCol`. The dimension side is reduced
    * to its distinct keys (broadcast-sized for real dimension tables),
    * then ONE broadcast left join + conditional count produces both the
    * orphan count and the total — the fact table is scanned once (the
    * join is against distinct keys, so row multiplicity is preserved).
    * Union with `run`'s output for a full report. */
  def foreignKey(df: DataFrame, fkCol: String,
      dim: DataFrame, pkCol: String): DataFrame = {
    val keys = dim.select(col(pkCol).as("__pk")).distinct()
    df.join(broadcast(keys), col(fkCol) === col("__pk"), "left")
      .agg(
        count_if(col(fkCol).isNotNull && col("__pk").isNull).as("violations"),
        count(lit(1)).as("total"))
      .select(lit(s"foreign_key:$fkCol").as("check"),
        col("violations"), col("total"),
        (col("violations") === 0L).as("passed"))
  }

  /** Row-level violation predicate (the per-row form of `violations`'
    * conditional count). Aggregate-level checks (`Unique`) have no
    * per-row verdict. */
  private def rowViolation(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && (col(col0) < lo || col(col0) > hi)
    case AcceptedValues(col0, vals) =>
      col(col0).isNotNull && !col(col0).isin(vals: _*)
    case Matches(col0, p) => col(col0).isNotNull && !col(col0).rlike(p)
    case _: Unique =>
      throw new IllegalArgumentException(
        "Unique is an aggregate-level check — no per-row verdict")
  }

  /** Dead-letter routing: tags every row with `reasons` — a
    * comma-joined list of the row-level checks it fails, NULL when the
    * row is clean. Callers split the stream (`reasons IS NULL` →
    * destination, else quarantine table) without a second evaluation of
    * the suite; the tagging is a pure map expression (no shuffle).
    * `Unique` is rejected: membership in a duplicate group is an
    * aggregate fact, not a row predicate — dedup operators own that. */
  def quarantine(df: DataFrame, checks: Seq[Check],
      reasonsCol: String = "reasons"): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val tags = checks.map(c => when(rowViolation(c), lit(c.name)))
    val joined = concat_ws(",", tags: _*)
    df.withColumn(reasonsCol, when(joined =!= "", joined))
  }
}
