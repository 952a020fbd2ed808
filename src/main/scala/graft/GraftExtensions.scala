package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DecimalDot, FloatDot, IntDot, JaroWinkler, RollingHash}

/** SparkSessionExtensions entry point: registers the library's native
  * expressions with the SQL function registry so plain SQL (and
  * spark.sql-routed tools) can call them:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   -- or --
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * `GraftExtensions.register(spark)` does the same on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => graft.plans.GeoFilterRule)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n,
        s"$name expects $n argument${if (n == 1) "" else "s"}, got ${args.length}")
      build(args)
    }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash",
      info("rolling_hash", "rolling_hash(str) - polynomial rolling-hash fingerprint"),
      arity("rolling_hash", 1)(args => RollingHash(args.head))),
    ("float_dot",
      info("float_dot", "float_dot(a, b) - native double dot product of float arrays"),
      arity("float_dot", 2)(args => FloatDot(args.head, args(1)))),
    ("decimal_dot",
      info("decimal_dot", "decimal_dot(a, b) - exact decimal dot product of float arrays"),
      arity("decimal_dot", 2)(args => DecimalDot(args.head, args(1)))),
    ("int_dot",
      info("int_dot", "int_dot(a, b) - exact long dot product of int arrays"),
      arity("int_dot", 2)(args => IntDot(args.head, args(1)))),
    ("jaro_winkler",
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity (byte-oriented)"),
      arity("jaro_winkler", 2)(args => JaroWinkler(args.head, args(1)))),
    ("geo_dist",
      info("geo_dist",
        "geo_dist(latA, lonA, latB, lonB) - equirectangular distance in km"),
      arity("geo_dist", 4)(args =>
        graft.functions.GeoDist(args(0), args(1), args(2), args(3)))),
    ("compress_ratio",
      info("compress_ratio",
        "compress_ratio(str) - deflate bytes / raw bytes redundancy signal"),
      arity("compress_ratio", 1)(args =>
        graft.functions.CompressRatio(args.head))),
    ("unicode_normalize",
      info("unicode_normalize",
        "unicode_normalize(str, form) - Unicode NFC/NFD/NFKC/NFKD normalization"),
      arity("unicode_normalize", 2)(args =>
        graft.functions.UnicodeNormalize(args.head,
          args(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
                if v != null => v.toString
            case other => throw new IllegalArgumentException(
              s"unicode_normalize: form must be a string literal, got $other")
          }))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Install the library's optimizer rules on a live session
    * (idempotent — rules already present are not re-added). */
  def registerRules(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.GeoFilterRule))
      spark.experimental.extraOptimizations = cur :+ graft.plans.GeoFilterRule
  }
}
