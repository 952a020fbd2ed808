package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Survival

/** Live survival curves on the StateStream rails: per-time counters
  * are mergeable by addition, so a cohort ingested in killed/restarted
  * micro-batches lands EXACTLY on the one-shot batch curve — the same
  * bit-equality contract as the sketch states (counter addition
  * commutes with the per-time aggregation). */
class SurvivalStreamSpec extends SparkSpec {
  import spark.implicits._

  private def cohort = (1 to 90).map { i =>
    // event_id doubles as the batch-splitting key
    (i.toLong, (i % 13 + 1).toDouble, if (i % 4 == 0) 0L else 1L)
  }.toDF("event_id", "dur", "ev")

  test("3-batch kill/restart ingest reproduces the one-shot KM curve " +
      "bit-for-bit") {
    val model = StateStream.survivalModel("dur", "ev")
    val dir = Files.createTempDirectory("graft_surv_stream").toString
    val (in, state, ckpt) = (s"$dir/in", s"$dir/state", s"$dir/ckpt")
    (0 to 2).foreach { i =>
      cohort.filter(col("event_id") % 3 === i)
        .coalesce(1).write.mode("append").parquet(in)
      val src = spark.readStream.schema(cohort.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = StateStream.start(src, model, state, ckpt)
      q.awaitTermination()
    }
    val streamed = Survival.kaplanMeierFromCounts(
        StateStream.current(spark, cohort, model, state))
      .orderBy("t").collect().map(_.toSeq)
    val direct = Survival.kaplanMeier(cohort, "dur", "ev")
      .orderBy("t").collect().map(_.toSeq)
    assert(streamed.toSeq === direct.toSeq)
  }

  test("an idempotent batch replay cannot double-count the state") {
    val model = StateStream.survivalModel("dur", "ev")
    val dir = Files.createTempDirectory("graft_surv_replay").toString
    val half = cohort.filter(col("event_id") <= 45)
    StateStream.processBatch(half, 0L, model, s"$dir/state")
    StateStream.processBatch(half, 0L, model, s"$dir/state") // replay
    StateStream.processBatch(cohort.filter(col("event_id") > 45),
      1L, model, s"$dir/state")
    val merged = Survival.kaplanMeierFromCounts(
        StateStream.current(spark, cohort, model, s"$dir/state"))
      .orderBy("t").collect().map(_.toSeq)
    val direct = Survival.kaplanMeier(cohort, "dur", "ev")
      .orderBy("t").collect().map(_.toSeq)
    assert(merged.toSeq === direct.toSeq)
  }
}
