package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Parquet schema evolution — the ETL reality a long-lived replication
  * pipeline faces: the source grows a column mid-history and the lake
  * holds files of BOTH shapes. Pins the two read disciplines this
  * library relies on:
  *
  *  - `mergeSchema`: the unified schema spans all files; rows from
  *    old files surface the new column as null (never a crash, never a
  *    silent drop);
  *  - explicit-schema reads (the torn-write discipline the streaming
  *    sinks use): requesting a column some files lack null-fills it,
  *    and pruning still reaches each file with its own physical schema.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unifies generations; old rows null-fill new columns") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("id", "name", "score"))
    val rows = merged.select("id", "score")
      .as[(Long, Option[Long])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> None,
      3L -> Some(30L), 4L -> Some(40L)))
  }

  test("explicit-schema read null-fills columns absent from old files " +
    "and keeps filters pushable") {
    val dir = Files.createTempDirectory("graft_evolve2").toString
    Seq((1L, "a")).toDF("id", "name").write.mode("append").parquet(dir)
    Seq((2L, "b", 20L)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)

    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", LongType)))
    val df = spark.read.schema(schema).parquet(dir)
    assert(df.as[(Long, String, Option[Long])].collect().toSet ==
      Set((1L, "a", None), (2L, "b", Some(20L))))
    // a filter on the evolved column still prunes (pushed to the scan)
    val plan = df.filter(col("score") > 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(score,0)"), plan)
    assert(df.filter(col("score") > 0).count() == 1)
  }
}
