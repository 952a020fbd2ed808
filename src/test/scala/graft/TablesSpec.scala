package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the loaded-table schema contract: every timestamp-ish column a
  * driver testdata regeneration might reshape (nanos-as-long, micros-NTZ,
  * …) must surface as a plain TimestampType after `Tables.load`. Round 7
  * shipped five dead queries because the driver silently switched
  * events.ts from parquet NANOS to micros-NTZ and only the NANOS branch
  * was normalized — this spec makes the NEXT drift fail loudly in one
  * place.
  */
class TablesSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("no loaded table exposes TimestampNTZ or raw-long timestamps") {
    Tables.names.foreach { name =>
      val df = Tables.load(spark, sfDir, name)
      df.schema.fields.foreach { f =>
        assert(f.dataType != TimestampNTZType,
          s"$name.${f.name} is TimestampNTZType — Tables.normalizeTimestamps missed it")
      }
      if (name == "events")
        assert(df.schema("ts").dataType == TimestampType,
          s"events.ts is ${df.schema("ts").dataType}, expected TimestampType")
    }
  }

  test("NTZ columns are cast micro-exactly under the pinned UTC session") {
    import spark.implicits._
    // Synthesize an NTZ column and run it through the normalizer: under a
    // UTC session the LTZ instant's epoch-us must equal the NTZ local
    // micros verbatim.
    val df = Seq(1705312800123456L, 0L, -62135596800000000L)
      .toDF("us")
      // LTZ->NTZ cast under the pinned UTC session preserves micros, so
      // this synthesizes an exact NTZ column without double arithmetic
      .selectExpr("us", "cast(timestamp_micros(us) as timestamp_ntz) as ts_ntz")
    assert(df.schema("ts_ntz").dataType == TimestampNTZType)
    val fixed = Tables.normalizeTimestamps(df, "synthetic")
    assert(fixed.schema("ts_ntz").dataType == TimestampType)
    val rows = fixed.selectExpr("us", "unix_micros(ts_ntz) as got").collect()
    rows.foreach { case Row(us: Long, got: Long) =>
      assert(got == us, s"NTZ->LTZ cast not micro-exact: $us -> $got")
    }
  }

  test("legacy nanos-as-long events branch still fires") {
    import spark.implicits._
    val df = Seq((1L, 1705312800123456789L)).toDF("event_id", "ts")
    val fixed = Tables.normalizeTimestamps(df, "events")
    assert(fixed.schema("ts").dataType == TimestampType)
    val got = fixed.selectExpr("unix_micros(ts)").as[Long].head()
    assert(got == 1705312800123456L)
  }
}
