package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequent SEQUENTIAL patterns over per-user event streams (the
  * PrefixSpan family, Pei et al. 2001, restricted to the
  * alphabet-bounded depth-3 case): a user supports <a, b> when some b
  * FOLLOWS some a (any gap — unlike [[Transitions]]' adjacent-only
  * matrix), and <a, b, c> when a c follows the earliest such a→b
  * witness. Support = fraction of users supporting the pattern — the
  * "which journeys actually happen" readout behind funnel design,
  * next to [[Association]]'s unordered itemsets.
  *
  * Correctness of the greedy witness: <a,b,c> is supported iff a c
  * occurs after the EARLIEST b that follows the EARLIEST a — existence
  * under subsequence semantics is monotone in witness position, so the
  * greedy choice never misses a pattern (the standard prefix-growth
  * argument).
  *
  * Relational shape, alphabet-bounded by construction: one per-user
  * position sort; first/last positions per (user, type) collapse the
  * stream to ≤ |alphabet| rows per user; level-2 is a per-user
  * |alphabet|² join of that bounded table; level-3 needs one join back
  * to the positioned stream for the earliest-b witness (the only
  * stream-sized join) plus another bounded |alphabet| fan-out. Support
  * counts are exact integers; `support` is one long/long double
  * division.
  *
  * Output: (p1, p2, p3, level, n_users, support) — p2/p3 null below
  * the pattern's level, patterns below `minSupport` dropped. */
object SequenceMining {

  def frequentSequences(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, minSupport: Double,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(minSupport >= 0.0 && minSupport <= 1.0,
      s"minSupport in [0,1], got $minSupport")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pos = scope.retain(df
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        row_number().over(w).cast("long").as("__p")))
    val nUsers = pos.select(col("__u")).distinct().count()
    require(nUsers > 0, "no users after null filtering")
    // first/last positions per (user, type): the alphabet-bounded frame
    val fl = scope.retain(pos.groupBy(col("__u"), col("__t"))
      .agg(min(col("__p")).as("__first"), max(col("__p")).as("__last")))
    val sup = (cnt: org.apache.spark.sql.Column) =>
      cnt.cast("double") / lit(nUsers.toDouble)
    // level 1: plain presence
    val l1 = fl.groupBy(col("__t").as("p1"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("p1"), lit(null).cast("string").as("p2"),
        lit(null).cast("string").as("p3"), lit(1).as("level"),
        col("n_users"))
    // level 2: some b after the first a  <=>  last(b) > first(a)
    val a = fl.select(col("__u"), col("__t").as("p1"),
      col("__first").as("__fa"))
    val b = fl.select(col("__u"), col("__t").as("p2"),
      col("__last").as("__lb"))
    val l2pairs = a.join(b, Seq("__u")).filter(col("__lb") > col("__fa"))
    val l2 = l2pairs.groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("p1"), col("p2"), lit(null).cast("string").as("p3"),
        lit(2).as("level"), col("n_users"))
    // level 3: earliest-b witness after first(a), then any c after it
    val wit = l2pairs.select(col("__u"), col("p1"), col("p2"), col("__fa"))
      .join(pos.select(col("__u"), col("__t").as("p2"),
        col("__p").as("__pb")), Seq("__u", "p2"))
      .filter(col("__pb") > col("__fa"))
      .groupBy(col("__u"), col("p1"), col("p2"))
      .agg(min(col("__pb")).as("__w"))
    val c = fl.select(col("__u"), col("__t").as("p3"),
      col("__last").as("__lc"))
    val l3 = wit.join(c, Seq("__u")).filter(col("__lc") > col("__w"))
      .groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("p1"), col("p2"), col("p3"), lit(3).as("level"),
        col("n_users"))
    l1.unionByName(l2).unionByName(l3)
      .withColumn("support", sup(col("n_users")))
      .filter(col("support") >= minSupport)
  }
}
