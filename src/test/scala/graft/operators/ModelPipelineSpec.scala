package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end quality-classifier pipeline — the composition the model
  * family exists for: deterministic split → IRLS logistic train →
  * expression-only scoring → AUC gate on validation → split-conformal
  * certification → corpus filter. Each operator has its own spec; this
  * pins that they COMPOSE (schemas, column contracts, determinism)
  * without a driver-side row loop anywhere.
  */
class ModelPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("train -> score -> AUC gate -> conformal certify -> filter composes") {
    // synthetic labelled docs: longer + fewer-digit docs are "good"
    val rnd = new scala.util.Random(19)
    val docs = (1L to 600L).map { id =>
      val len = rnd.nextInt(200) + 20
      val digitRatio = rnd.nextInt(100) / 100.0
      val quality = 1.0 / (1.0 + math.exp(-(len / 40.0 - 4.0 * digitRatio)))
      (id, len.toDouble, digitRatio,
        if (rnd.nextDouble() < quality) 1.0 else 0.0)
    }.toDF("doc_id", "len", "digit_ratio", "label")

    // deterministic md5 split — reproducible on any partitioning
    val split = Splits.assign(docs, col("doc_id").cast("string"),
      Seq(("train", 0.5), ("cal", 0.25), ("test", 0.25)))
    val train = split.filter(col("split") === "train")
    val cal = split.filter(col("split") === "cal")
    val test = split.filter(col("split") === "test")

    // 1. train the quality classifier (one distributed pass per iter)
    val Some(beta) = LinearModel.logisticFit(
      train, "label", Seq("len", "digit_ratio"), iters = 6, ridge = 1e-4)

    // 2. score everything with the pure map expression
    def scored(df: org.apache.spark.sql.DataFrame) =
      LinearModel.logisticScore(df, beta, Seq("len", "digit_ratio"), "s")
        .withColumn("k", lit("all"))

    // 3. AUC gate on held-out data: the fit must rank usefully.
    //    Scores quantize to 1e-3 blocks first — the operator's
    //    documented bounded-distinct contract.
    // label must be integral for the exact integer algebra
    def withIntLabel(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("label_i", col("label").cast("long"))
    val auc = Auc.aucByKey(
      withIntLabel(scored(test)).withColumn("sq", floor(col("s") * 1000)),
      "k", "sq", "label_i").collect()(0).getLong(3)
    assert(auc > 700000L, s"classifier should rank well, AUC ppm = $auc")

    // 4. conformal-certify the score as a probability estimate: the
    //    calibration residual |label - s| yields a radius such that
    //    ~90% of test labels fall inside [s - q, s + q]
    val calR = withIntLabel(scored(cal))
      .withColumn("resid", abs(col("label") - col("s")))
    val rad = Conformal.radius(calR, "k", "resid", 9, 10)
    val testR = withIntLabel(scored(test))
      .withColumn("resid", abs(col("label") - col("s")))
    val cov = Conformal.coverage(testR, rad, "k", "resid").collect()(0)
    // the 90% guarantee holds in expectation; realized coverage on
    // n_test ≈ 150 fluctuates ±2.4% per sd — assert within ~4 sd
    assert(cov.getLong(5) >= 800000L,
      s"conformal coverage must hold near 90%, got ${cov.getLong(5)} ppm")

    // 5. calibration readout on the test split: quantize the logistic
    //    score to micro units (Calibration's integer contract), then
    //    the reliability table + exact ECE and the fused
    //    Brier/confusion row — the numbers that decide whether the
    //    score can gate corpus admission as a PROBABILITY, not just a
    //    ranking (AUC alone can't tell).
    val micro = withIntLabel(scored(test))
      .withColumn("s_micro",
        least(floor(col("s") * 1000000).cast("long"), lit(1000000L)))
    val rel = Calibration.reliability(micro, "s_micro", "label_i", 10)
    val ece = rel.select("ece").as[Double].head()
    assert(ece >= 0.0 && ece < 0.25,
      s"a fitted logistic should be roughly calibrated, ECE = $ece")
    val eval = Calibration.evalAt(micro, "s_micro", "label_i", 500000L)
      .collect().head
    val brier = eval.getDouble(1)
    assert(brier < 0.25, s"Brier must beat the coin-flip bound, $brier")
    assert(eval.getLong(2) + eval.getLong(3) +
      eval.getLong(4) + eval.getLong(5) == micro.count(),
      "confusion cells must partition the test split")

    // 6. filter: keep docs scoring above 0.5 — deterministic output
    val kept = scored(docs).filter(col("s") > 0.5)
    assert(kept.count() > 50 && kept.count() < 550)
    val twice = scored(docs).filter(col("s") > 0.5).count()
    assert(twice === kept.count(), "pipeline must be rerun-deterministic")
  }
}
