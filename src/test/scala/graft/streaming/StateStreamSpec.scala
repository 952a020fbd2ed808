package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{QuantileSketch, ThetaSketchOps}

/** The continuous-ingest contract for the sketch state families: KLL
  * quantile state and theta set state ride [[StateStream]] through
  * kill/restart micro-batch ingest and land exactly where a one-shot
  * batch build lands (exact regime: under-capacity sketches make the
  * equality literal, not approximate). */
class StateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ingestInThirds(ev: DataFrame, model: StateStream.Model,
      dir: String): Unit = {
    val (in, state, ckpt) = (s"$dir/in", s"$dir/state", s"$dir/ckpt")
    (0 to 2).foreach { i =>
      ev.filter(col("event_id") % 3 === i)
        .coalesce(1).write.mode("append").parquet(in)
      val src = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = StateStream.start(src, model, state, ckpt)
      q.awaitTermination()
      assert(!q.isActive)
    }
  }

  test("KLL state: 3-batch kill/restart ingest == direct build " +
    "(exact-regime quantiles)") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events",
      parallelize = false)
    // k = 1024 keeps every per-type group (~200 values at sf0.001)
    // comfortably under capacity — the exact, deterministic regime
    val K = 1024
    val model = StateStream.kllModel(Seq("event_type"), "value", K)
    val dir = Files.createTempDirectory("graft_kll_stream").toString
    ingestInThirds(ev, model, dir)
    val streamed = QuantileSketch.quantiles(
        StateStream.current(spark, ev, model, s"$dir/state"),
        Seq("event_type"), Seq(0.25, 0.5, 0.75), K)
      .as[(String, Double, Double)].collect().toSet
    val direct = QuantileSketch.quantiles(
        QuantileSketch.build(ev, Seq("event_type"), "value", K),
        Seq("event_type"), Seq(0.25, 0.5, 0.75), K)
      .as[(String, Double, Double)].collect().toSet
    assert(streamed == direct && streamed.nonEmpty)
  }

  test("theta state: streamed ingest, compaction, and post-compaction " +
    "ingest preserve exact distinct sets") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events",
      parallelize = false)
    val model = StateStream.thetaModel(Seq("event_type"), "user_id")
    val dir = Files.createTempDirectory("graft_theta_stream").toString
    ingestInThirds(ev, model, dir)
    def estimates(state: DataFrame) =
      ThetaSketchOps.overlap(state, state, Seq("event_type"))
        .select("event_type", "n_a")
        .as[(String, Double)].collect().toMap
    val direct = estimates(
      ThetaSketchOps.build(ev, Seq("event_type"), "user_id"))
    assert(estimates(StateStream.current(spark, ev, model,
      s"$dir/state")) == direct)
    // compact to one partition, verify unchanged, then ingest more
    StateStream.compact(spark, ev, model, s"$dir/state")
    assert(estimates(StateStream.current(spark, ev, model,
      s"$dir/state")) == direct)
    val extra = Seq((999999L, "click", 424242L))
      .toDF("event_id", "event_type", "user_id")
    StateStream.processBatch(extra, Long.MaxValue, model, s"$dir/state")
    val after = estimates(StateStream.current(spark, ev, model,
      s"$dir/state"))
    assert(after("click") == direct("click") + 1.0)
  }

  test("count-min state: streamed ingest == direct build, " +
    "exact estimates after compaction") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events",
      parallelize = false)
    val Depth = 3; val Width = 64
    val model = StateStream.countMinModel("user_id", Depth, Width)
    val dir = Files.createTempDirectory("graft_cms_stream").toString
    ingestInThirds(ev, model, dir)
    val probes = ev.select("user_id").distinct()
    def estimates(state: DataFrame) =
      graft.operators.CountMin.estimate(state, probes, "user_id",
          Depth, Width)
        .as[(Long, Long)].collect().toMap
    val direct = estimates(
      graft.operators.CountMin.build(ev, "user_id", Depth, Width))
    assert(estimates(StateStream.current(spark, ev, model,
      s"$dir/state")) == direct && direct.nonEmpty)
    // counter addition is merge: compaction cannot change any estimate
    StateStream.compact(spark, ev, model, s"$dir/state")
    assert(estimates(StateStream.current(spark, ev, model,
      s"$dir/state")) == direct)
  }

  test("regression moment state: streamed ingest solves bit-equal to a direct fit") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events",
      parallelize = false)
      .select(col("event_type"), col("value"),
        (col("user_id") % 100).cast("double").as("x1"),
        (col("event_id") % 7).cast("double").as("x2"))
    val model = StateStream.regressionModel("event_type", "value", "x1", "x2")
    val dir = Files.createTempDirectory("graft_reg_stream").toString
    ingestInThirds(ev, model, dir)
    def fits(state: org.apache.spark.sql.DataFrame) =
      graft.operators.LinearModel.ridgeFromState(state, "event_type", 5.0)
        .collect().map(r => r.getString(0) -> r.toSeq).toMap
    val direct = fits(graft.operators.LinearModel.momentState(
      ev, "event_type", "value", "x1", "x2"))
    assert(fits(StateStream.current(spark, ev, model,
      s"$dir/state")) == direct && direct.nonEmpty)
    // decimal addition is the merge: compaction cannot move any coefficient
    StateStream.compact(spark, ev, model, s"$dir/state")
    assert(fits(StateStream.current(spark, ev, model,
      s"$dir/state")) == direct)
  }

  test("calibration bin state: streamed ingest yields the bit-equal " +
    "reliability table, compaction-invariant") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events",
        parallelize = false)
      .withColumn("score_micro",
        pmod(col("event_id") * 37L, lit(1000001L)))
      .withColumn("y", (col("event_id") % 3 === 0).cast("long"))
    val model = StateStream.calibrationModel("score_micro", "y", 10)
    val dir = Files.createTempDirectory("graft_cal_stream").toString
    ingestInThirds(ev, model, dir)
    def table(counts: DataFrame) =
      graft.operators.Calibration.reliabilityFromCounts(counts)
        .as[(Int, Long, Long, Long, Double, Double, Long, Double)]
        .collect().toSet
    val direct = table(graft.operators.Calibration.binCounts(
      ev, "score_micro", "y", 10))
    assert(table(StateStream.current(spark, ev, model,
      s"$dir/state")) == direct && direct.nonEmpty)
    // counter addition is the merge: compaction changes nothing
    StateStream.compact(spark, ev, model, s"$dir/state")
    assert(table(StateStream.current(spark, ev, model,
      s"$dir/state")) == direct)
  }

  test("PSI drift state: streamed bin counts score bit-equal to batch, " +
    "compaction-invariant") {
    // actual = streamed event-value bins; expected = a frozen reference
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events",
        parallelize = false)
      .withColumn("bin", floor(col("value") / 10.0).cast("long"))
    val expected = graft.operators.Divergence.binCounts(
      ev.filter(col("event_id") % 2 === 0), "bin")
      .localCheckpoint()
    val model = StateStream.binCountModel("bin")
    val dir = Files.createTempDirectory("graft_psi_stream").toString
    ingestInThirds(ev, model, dir)
    def score(counts: DataFrame) =
      graft.operators.Divergence.psiFromCounts(counts, expected)
        .as[(Long, Long, Long, Double)].head()
    val direct = score(graft.operators.Divergence.binCounts(ev, "bin"))
    assert(score(StateStream.current(spark, ev, model,
      s"$dir/state")) === direct)
    assert(direct._4 >= 0.0 && !direct._4.isNaN)
    StateStream.compact(spark, ev, model, s"$dir/state")
    assert(score(StateStream.current(spark, ev, model,
      s"$dir/state")) === direct)
  }

  test("a batch id behind the stored state refuses loudly") {
    val model = StateStream.thetaModel(Seq("event_type"), "user_id")
    val dir = Files.createTempDirectory("graft_guard_stream").toString
    val rows = Seq((1L, "click", 7L)).toDF("event_id", "event_type", "user_id")
    StateStream.processBatch(rows, 5L, model, s"$dir/state")
    val e = intercept[IllegalArgumentException] {
      StateStream.processBatch(rows, 3L, model, s"$dir/state")
    }
    assert(e.getMessage.contains("behind the stored state"))
    // replaying the SAME batch id is the idempotent path, not an error
    StateStream.processBatch(rows, 5L, model, s"$dir/state")
  }
}
