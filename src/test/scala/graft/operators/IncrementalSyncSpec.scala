package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Merge semantics per the reference contract (sync_db_2_db,
  * fast_etl.py:454-652; FIXTURES.md A2 scenario). */
class IncrementalSyncSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val dest = Seq(
    (1L, "old-1", ts("2024-01-01 00:00:00")),
    (2L, "old-2", ts("2024-01-02 00:00:00")),
    (3L, "old-3", ts("2024-01-03 00:00:00"))
  ).toDF("id", "payload", "updated_at")

  private val source = Seq(
    (1L, "old-1", ts("2024-01-01 00:00:00")),   // unchanged, before wm
    (2L, "new-2", ts("2024-01-05 00:00:00")),   // updated after wm
    (3L, "tie-3", ts("2024-01-03 00:00:00")),   // AT the watermark: missed (strict >)
    (4L, "new-4", ts("2024-01-06 00:00:00"))    // inserted after wm
  ).toDF("id", "payload", "updated_at")

  test("watermark is max(date) at destination; empty dest errors") {
    assert(IncrementalSync.watermark(dest, "updated_at") == ts("2024-01-03 00:00:00"))
    val err = intercept[IllegalArgumentException] {
      IncrementalSync.watermark(dest.filter(lit(false)), "updated_at")
    }
    assert(err.getMessage.contains("full load required"))
  }

  test("sync updates matched keys, inserts new ones, misses watermark ties (reference bug kept)") {
    val result = IncrementalSync.sync(source, dest, Seq("id"), "updated_at")
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(result == Map(
      1L -> "old-1",   // untouched
      2L -> "new-2",   // updated
      3L -> "old-3",   // tie at watermark NOT re-pulled (fast_etl.py:422-425)
      4L -> "new-4"))  // inserted
  }

  test("inclusive watermark (the documented >= fix) re-pulls boundary rows") {
    val wm = IncrementalSync.watermark(dest, "updated_at")
    val inc = IncrementalSync.increment(source, "updated_at", wm, inclusive = true)
    val merged = IncrementalSync.mergeBatch(dest, inc, Seq("id"))
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(merged(3L) == "tie-3") // boundary row included with >=
  }

  test("sinceOverride widens the increment like since_datetime") {
    val result = IncrementalSync.sync(source, dest, Seq("id"), "updated_at",
        sinceOverride = Some(ts("2024-01-02 23:59:59")))
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(result(3L) == "tie-3") // now included
  }

  test("exclusion sync drops registered keys") {
    val excl = Seq((4L, ts("2024-01-07 00:00:00"))).toDF("id", "deleted_at")
    val result = IncrementalSync.sync(source, dest, Seq("id"), "updated_at",
        exclusions = Some(excl))
      .select("id").as[Long].collect().toSet
    assert(result == Set(1L, 2L, 3L))
  }

  test("merge is idempotent over randomized workloads (seeded)") {
    val rnd = new scala.util.Random(42)
    val destR = (1 to 200).map(i =>
      (i.toLong, s"v${rnd.nextInt(1000)}", ts("2024-01-01 00:00:00")))
      .toDF("id", "payload", "updated_at")
    val incR = (1 to 120).map(_ =>
      (rnd.nextInt(300).toLong, s"n${rnd.nextInt(1000)}", ts("2024-02-01 00:00:00")))
      .toDF("id", "payload", "updated_at").dropDuplicates("id")
    val once = IncrementalSync.mergeBatch(destR, incR, Seq("id"))
    val twice = IncrementalSync.mergeBatch(once, incR, Seq("id"))
    assert(once.collect().toSet == twice.collect().toSet)
    // keys are exactly the union of both sides
    val keys = once.select("id").as[Long].collect().toSet
    val expected = destR.select("id").as[Long].collect().toSet ++
      incR.select("id").as[Long].collect().toSet
    assert(keys == expected)
  }

  test("duplicate keys in the increment replace the dest row with exactly those rows") {
    val inc = Seq(
      (2L, "dup-a", ts("2024-01-05 00:00:00")),
      (2L, "dup-b", ts("2024-01-05 00:00:01"))).toDF("id", "payload", "updated_at")
    val merged = IncrementalSync.mergeBatch(dest, inc, Seq("id"))
    assert(merged.filter(col("id") === 2L).count() == 2)
    assert(merged.count() == 4) // 2 untouched + 2 increment rows
  }
}
