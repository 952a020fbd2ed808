package graft.operators

import graft.SparkSpec

class FriedmanSpec extends SparkSpec {
  import spark.implicits._

  test("matches the hand-worked 3-treatment block design") {
    // 4 subjects × 3 treatments, treatment c always highest:
    // per-subject ranks (a,b,c) = (1,2,3) each → R = (4,8,12)
    // χ² = 12/(4·3·4)·(16+64+144) − 3·4·4 = 224/4 − 48 = 8
    val rows = for (s <- 1 to 4; (t, v) <- Seq(("a", 1.0), ("b", 2.0),
      ("c", 3.0))) yield (s.toLong, t, v + s * 10) // shift per block
    val df = rows.toDF("subj", "trt", "v")
    val r = Inference.friedman(df, "subj", "trt", "v")
      .select("n_subjects", "k", "chi2", "chi2_adj").head()
    assert(r.getLong(0) === 4 && r.getLong(1) === 3)
    assert(math.abs(r.getDouble(2) - 8.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 8.0) < 1e-9) // no ties
  }

  test("incomplete blocks are excluded and counted") {
    val rows = Seq(
      (1L, "a", 1.0), (1L, "b", 2.0),
      (2L, "a", 2.0), (2L, "b", 1.0),
      (3L, "a", 5.0)) // subject 3 misses treatment b
    val r = Inference.friedman(rows.toDF("subj", "trt", "v"),
      "subj", "trt", "v")
      .select("n_subjects", "n_excluded").head()
    assert(r.getLong(0) === 2 && r.getLong(1) === 1)
  }

  test("all-tied blocks yield chi2 = 0 and null adjusted chi2") {
    val rows = for (s <- 1 to 3; t <- Seq("a", "b"))
      yield (s.toLong, t, 7.0)
    val r = Inference.friedman(rows.toDF("subj", "trt", "v"),
      "subj", "trt", "v").select("chi2", "chi2_adj").head()
    assert(math.abs(r.getDouble(0) - 0.0) < 1e-9)
    assert(r.isNullAt(1)) // tie correction denominator hits zero
  }

  test("duplicate (subject, treatment) rows collapse by exact sum") {
    val once = Seq((1L, "a", 3.0), (1L, "b", 1.0),
      (2L, "a", 3.0), (2L, "b", 1.0)).toDF("subj", "trt", "v")
    val split = Seq((1L, "a", 1.0), (1L, "a", 2.0), (1L, "b", 1.0),
      (2L, "a", 3.0), (2L, "b", 1.0)).toDF("subj", "trt", "v")
    val a = Inference.friedman(once, "subj", "trt", "v")
      .select("chi2").head().getDouble(0)
    val b = Inference.friedman(split, "subj", "trt", "v")
      .select("chi2").head().getDouble(0)
    assert(math.abs(a - b) < 1e-12)
  }
}
