package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecayScoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("decays by whole days against the newest event date") {
    val ev = Seq(
      (1L, ts("2024-01-03 12:00:00"), 10.0), // age 0
      (1L, ts("2024-01-02 23:59:59"), 10.0), // age 1
      (1L, ts("2024-01-01 00:00:01"), 10.0)  // age 2
    ).toDF("u", "t", "v")
    val r = DecayScore.scoreFromMaxDate(ev, "u", "t", "v", 0.5)
      .as[(Long, Long, BigDecimal)].collect().toSeq
    assert(r.map(x => (x._1, x._2)) == Seq((1L, 3L)))
    // 10*1 + 10*0.5 + 10*0.25 = 17.5
    assert(r.head._3 == BigDecimal("17.50000000000000"))
  }

  test("lambda = 1 reduces to a plain sum") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.25),
      (1L, ts("2024-03-01 10:00:00"), 2.75),
      (2L, ts("2024-01-15 10:00:00"), 4.00)
    ).toDF("u", "t", "v")
    val r = DecayScore.scoreFromMaxDate(ev, "u", "t", "v", 1.0)
      .as[(Long, Long, BigDecimal)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r(1L) == ((2L, BigDecimal("4.00000000000000"))))
    assert(r(2L) == ((1L, BigDecimal("4.00000000000000"))))
  }

  test("events after an explicit reference date count with age 0, not negative") {
    val ev = Seq(
      (1L, ts("2024-01-10 10:00:00"), 8.0) // 9 days AFTER the ref date
    ).toDF("u", "t", "v")
    val r = DecayScore.score(ev, "u", "t", "v", 0.5,
        to_date(lit("2024-01-01")))
      .as[(Long, Long, BigDecimal)].collect().toSeq
    // a negative age would INFLATE the score (0.5^-9 = 512x); late
    // replays must count at full weight instead
    assert(r.head._3 == BigDecimal("8.00000000000000"))
  }

  test("a value overflowing DECIMAL(12,2) fails loudly, never silently vanishes") {
    // non-ANSI Spark would null the cast and sum() would skip the row
    // while n_events still counted it — silent data loss
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 1.5e10)
    ).toDF("u", "t", "v")
    val e = intercept[Exception] {
      DecayScore.score(ev, "u", "t", "v", 0.5, to_date(lit("2024-01-02")))
        .collect()
    }
    assert(e.getMessage.contains("overflows DECIMAL(12,2)"))
  }

  test("rejects decay factors outside (0, 1]") {
    val ev = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("u", "t", "v")
    intercept[IllegalArgumentException] {
      DecayScore.score(ev, "u", "t", "v", 0.0, to_date(lit("2024-01-01")))
    }
    intercept[IllegalArgumentException] {
      DecayScore.score(ev, "u", "t", "v", 1.5, to_date(lit("2024-01-01")))
    }
  }
}
