package graft.operators

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.IO

/** The reference's canonical end-to-end test, reproduced: a deterministic
  * A1 fixture (FIXTURES.md — 1500 rows x 9 columns, fixed value pools,
  * extreme dates in years 1 and 3227) is full-copied into a live JDBC
  * destination and read back; source is the golden oracle
  * (tests/test_db_to_db_operator.py:241-249 assert_frame_equal pattern).
  */
final case class A1Row(
    id: Long, Name: String, Description: String, Description2: String,
    Age: Long, Weight: Double, Birth: Date, Active: Boolean,
    date_time: Timestamp)

class RoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftrt;create=true"

  /** Deterministic generator mirroring the reference's pools
    * (test_db_to_db_operator.py:55-117): names from a 6-value pool, lorem
    * descriptions, extreme dates including years 1 and 3227. */
  private def fixture: Seq[A1Row] = {
    val names = Seq("Anna", "Bruno", "Carla", "Diego", "Edite", "Fabio")
    val lorem = Seq(
      "Lorem ipsum dolor sit amet, consectetur adipiscing elit.",
      "Sed do eiusmod tempor incididunt ut labore et dolore magna.")
    val dates = Seq("0001-01-03", "1970-01-01", "2023-06-15", "3227-12-31")
    val times = Seq("0001-01-03 04:05:06.789", "1970-01-01 00:00:00.0",
      "2023-06-15 12:34:56.123", "3227-12-31 23:59:59.999")
    val rnd = new scala.util.Random(42)
    (0 until 1500).map { i =>
      A1Row(
        id = i.toLong,
        Name = names(rnd.nextInt(names.length)),
        Description = lorem(rnd.nextInt(lorem.length)),
        Description2 = lorem(rnd.nextInt(lorem.length)),
        Age = 1L + rnd.nextInt(1000000),
        Weight = math.round(rnd.nextDouble() * 100000.0) / 100.0,
        Birth = Date.valueOf(dates(rnd.nextInt(dates.length))),
        Active = rnd.nextBoolean(),
        date_time = Timestamp.valueOf(times(rnd.nextInt(times.length))))
    }
  }

  test("A1 full-copy roundtrip through JDBC is lossless, extreme dates included") {
    val source = fixture.toDF()
    val aligned = FullCopy.align(source,
      destColumns = source.columns.toIndexedSeq)
    IO.JdbcSink(url, "a1_dest").write(aligned, truncate = false)

    val back = IO.JdbcSource(url, table = Some("a1_dest")).read(spark)
    assert(back.count() == 1500)

    val src = source.orderBy("id").collect()
    val dst = back.orderBy("id").collect()
    src.zip(dst).foreach { case (s, d) =>
      assert(s.getLong(0) == d.getLong(0))
      assert(s.getString(1) == d.getString(1))
      assert(s.getString(2) == d.getString(2))
      assert(s.getString(3) == d.getString(3))
      assert(s.getLong(4) == d.getLong(4))
      assert(s.getDouble(5) == d.getDouble(5))
      assert(s.getDate(6) == d.getDate(6), s"Birth mismatch: ${s.getDate(6)} vs ${d.getDate(6)}")
      assert(s.getBoolean(7) == d.getBoolean(7))
      assert(s.getTimestamp(8) == d.getTimestamp(8),
        s"date_time mismatch: ${s.getTimestamp(8)} vs ${d.getTimestamp(8)}")
    }
  }

  test("A1 truncate-then-load replaces content like the reference's matrix") {
    val v2 = fixture.take(100).toDF()
    IO.JdbcSink(url, "a1_dest").write(v2, truncate = true)
    val back = IO.JdbcSource(url, table = Some("a1_dest")).read(spark)
    assert(back.count() == 100)
  }
}
