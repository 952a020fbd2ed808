package graft.operators

import graft.SparkSpec

class SequenceMiningSpec extends SparkSpec {
  import spark.implicits._

  private def mine(rows: Seq[(String, Long, String)], minSup: Double = 0.0) =
    SequenceMining.frequentSequences(
      rows.map { case (u, t, e) => (u, t, t, e) }.toDF("u", "ts", "id", "e"),
      "u", "ts", "id", "e", minSup)

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select("p1", "p2", "p3", "n_users")
      .as[(String, Option[String], Option[String], Long)].collect()
      .map(r => (r._1, r._2.orNull, r._3.orNull) -> r._4).toMap

  test("gapped subsequences count; order matters; greedy witness is safe") {
    // u1: a x b c  — supports <a,b> (gap), <a,b,c>, <a,c>, NOT <b,a>
    // u2: b a      — supports <b,a>, NOT <a,b>
    val m = asMap(mine(Seq(
      ("u1", 1L, "a"), ("u1", 2L, "x"), ("u1", 3L, "b"), ("u1", 4L, "c"),
      ("u2", 1L, "b"), ("u2", 2L, "a"))))
    assert(m(("a", "b", null)) == 1)
    assert(m(("a", "c", null)) == 1)
    assert(m(("b", "a", null)) == 1) // u2 only
    assert(m(("a", "b", "c")) == 1)
    assert(!m.contains(("b", "c", "a")))
    assert(m(("a", null, null)) == 2)
  }

  test("greedy earliest witness never misses a valid embedding") {
    // a b a b c: the earliest a->b witness is position 2; c follows it.
    // Also <a,b,b>: earliest witness pos 2, second b at pos 4 — found.
    val m = asMap(mine(Seq(
      ("u", 1L, "a"), ("u", 2L, "b"), ("u", 3L, "a"),
      ("u", 4L, "b"), ("u", 5L, "c"))))
    assert(m(("a", "b", "c")) == 1)
    assert(m(("a", "b", "b")) == 1)
    assert(m(("a", "a", "b")) == 1)
    assert(!m.contains(("c", "a", null)))
  }

  test("support threshold filters and equals exact user fractions") {
    // <a,b> in 2 of 4 users -> support .5; <a,c> in 1 of 4 -> .25
    val rows = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"),
      ("u2", 1L, "a"), ("u2", 2L, "b"),
      ("u3", 1L, "a"), ("u3", 2L, "c"),
      ("u4", 1L, "b"))
    val kept = mine(rows, minSup = 0.5)
      .select("p1", "p2", "p3", "support")
      .as[(String, Option[String], Option[String], Double)].collect()
    val km = kept.map(r => (r._1, r._2.orNull, r._3.orNull) -> r._4).toMap
    assert(km(("a", "b", null)) == 0.5)
    assert(!km.contains(("a", "c", null)), "support .25 must be dropped")
    assert(km(("a", null, null)) == 0.75)
  }

  test("deterministic under repartitioning") {
    val rows = (0 until 300).map { i =>
      (s"u${i % 23}", i.toLong, Seq("a", "b", "c", "d")((i * 7) % 4))
    }
    def go(parts: Int) = asMap(SequenceMining.frequentSequences(
      rows.map { case (u, t, e) => (u, t, t, e) }
        .toDF("u", "ts", "id", "e").repartition(parts),
      "u", "ts", "id", "e", 0.1))
    assert(go(2) == go(11))
  }
}
