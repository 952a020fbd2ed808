package graft.operators

import graft.SparkSpec

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  // 4 matches (3 agree), 4 non-matches (1 agrees):
  // m = (3+1)/(4+2) = 2/3, u = (1+1)/(4+2) = 1/3
  private def labeled() = Seq(
    (true, true), (true, true), (true, true), (true, false),
    (false, true), (false, false), (false, false), (false, false)
  ).toDF("is_match", "f")

  test("counted m/u and micro weights match the hand computation") {
    val w = RecordLinkage.fieldWeights(labeled(), "is_match", Seq("f"))
      .select("n_match", "n_nonmatch", "f_m", "f_u",
        "f_wa_micro", "f_wd_micro")
      .as[(Long, Long, Double, Double, Long, Long)].head()
    assert(w._1 === 4L && w._2 === 4L)
    assert(math.abs(w._3 - 2.0 / 3.0) < 1e-15)
    assert(math.abs(w._4 - 1.0 / 3.0) < 1e-15)
    assert(w._5 === math.floor(math.log(2.0) * 1e6).toLong)
    assert(w._6 === math.floor(math.log(0.5) * 1e6).toLong)
  }

  test("scores are exact integer micro sums of the field weights") {
    val w = RecordLinkage.fieldWeights(labeled(), "is_match", Seq("f"))
    val pairs = Seq((1L, true), (2L, false)).toDF("id", "f")
    val out = RecordLinkage.score(pairs, w, Seq("f"))
      .select("id", "score_micro").as[(Long, Long)].collect().toMap
    assert(out(1L) === math.floor(math.log(2.0) * 1e6).toLong)
    assert(out(2L) === math.floor(math.log(0.5) * 1e6).toLong)
    assert(out(1L) > out(2L)) // agreement must outrank disagreement
  }

  test("add-one smoothing keeps degenerate training finite") {
    val degen = Seq((true, true), (true, true), (false, false))
      .toDF("is_match", "f")
    val w = RecordLinkage.fieldWeights(degen, "is_match", Seq("f"))
      .select("f_wa_micro", "f_wd_micro").as[(Long, Long)].head()
    // m = 3/4, u = 1/3 — no ln(0)/ln(inf) despite perfect separation
    assert(w._1 === math.floor(math.log((3.0 / 4.0) / (1.0 / 3.0)) * 1e6).toLong)
    assert(w._2 === math.floor(math.log((1.0 / 4.0) / (2.0 / 3.0)) * 1e6).toLong)
  }

  test("multi-field scores add per-field contributions") {
    val lab = Seq((true, true, true), (true, true, false),
      (false, false, true), (false, false, false))
      .toDF("is_match", "f1", "f2")
    val w = RecordLinkage.fieldWeights(lab, "is_match", Seq("f1", "f2"))
    val pairs = Seq((1L, true, true)).toDF("id", "f1", "f2")
    val total = RecordLinkage.score(pairs, w, Seq("f1", "f2"))
      .select("score_micro").as[Long].head()
    val w1 = w.select("f1_wa_micro").as[Long].head()
    val w2 = w.select("f2_wa_micro").as[Long].head()
    assert(total === w1 + w2)
  }
}
