package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch state: estimates are verified against an
  * INDEPENDENT plain-Scala replay of the sketch (java MessageDigest
  * md5, loop-built counters) — same defense the simhash/minhash specs
  * use: the Spark expression pipeline and a from-scratch implementation
  * must agree bit-for-bit on a fixed fixture. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val Depth = 3
  private val Width = 16

  /** From-scratch CMS over (item, weight) pairs — no Spark. */
  private def referenceCms(rows: Seq[(String, Long)]): Map[String, Long] = {
    def bucket(item: String, seed: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$item:$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(8), 16) % Width).toInt
    }
    val counters = Array.fill(Depth, Width)(0L)
    for ((item, w) <- rows; s <- 0 until Depth)
      counters(s)(bucket(item, s)) += w
    rows.map(_._1).distinct
      .map(i => i -> (0 until Depth).map(s => counters(s)(bucket(i, s))).min)
      .toMap
  }

  // skewed fixture: zipf-ish counts, enough items to collide at width 16
  private val fixture: Seq[(String, Long)] =
    (1 to 40).flatMap(i => Seq.fill(41 - i)((s"item$i", 1L)))

  test("estimates match an independent from-scratch replay exactly") {
    val df = fixture.toDF("item", "w")
    val state = CountMin.build(df, "item", Depth, Width)
    val got = CountMin.estimate(state, df, "item", Depth, Width)
      .as[(String, Long)].collect().toMap
    assert(got == referenceCms(fixture))
  }

  test("never under-counts; exact when width is collision-free") {
    val df = fixture.toDF("item", "w")
    val exact = fixture.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val est = CountMin.estimate(
      CountMin.build(df, "item", Depth, Width), df, "item", Depth, Width)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) => assert(est(k) >= n, k) }
    // wide sketch: 40 items in 3 rows of 4096 buckets -> exact counts
    val wide = CountMin.estimate(
      CountMin.build(df, "item", Depth, 4096), df, "item", Depth, 4096)
      .as[(String, Long)].collect().toMap
    assert(wide == exact)
  }

  test("per-batch states merge to exactly the full-rebuild state") {
    val (h1, h2) = fixture.splitAt(fixture.size / 2)
    val merged = CountMin.merge(
      CountMin.build(h1.toDF("item", "w"), "item", Depth, Width),
      CountMin.build(h2.toDF("item", "w"), "item", Depth, Width))
    val full = CountMin.build(fixture.toDF("item", "w"), "item", Depth, Width)
    assert(merged.as[(Int, Long, Long)].collect().toSet ==
      full.as[(Int, Long, Long)].collect().toSet)
  }

  test("weighted build sums weights; null items are dropped") {
    val df = Seq(("a", 5L), ("a", 7L), ("b", 1L), (null, 99L))
      .toDF("item", "w")
    val est = CountMin.estimate(
      CountMin.build(df, "item", Depth, 4096, Some("w")),
      df.filter($"item".isNotNull), "item", Depth, 4096)
      .as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 12L, "b" -> 1L))
  }
}
