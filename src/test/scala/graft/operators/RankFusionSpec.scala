package graft.operators

import graft.SparkSpec

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed fusion: agreement beats a single first place") {
    // A: x=1, y=2, z=3 ; B: y=1, z=2 (x missing)
    // x: 1/61 ≈ .01639 ; y: 1/62 + 1/61 ≈ .03252 ; z: 1/63 + 1/62 ≈ .03200
    val a = Seq(("x", 1L), ("y", 2L), ("z", 3L)).toDF("id", "r")
    val b = Seq(("y", 1L), ("z", 2L)).toDF("id", "r")
    val out = RankFusion.rrf(Seq(a, b), "id", "r", 10)
      .select("id", "rrf_score", "fused_rank")
      .as[(String, Double, Int)].collect().sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq("y", "z", "x"))
    assert(out.head._2 == 1.0 / 62.0 + 1.0 / 61.0)
    assert(out.last._2 == 1.0 / 61.0 + 0.0)
  }

  test("score ties break by id; topK truncates") {
    // mirrored ranks -> identical scores for p and q
    val a = Seq(("p", 1L), ("q", 2L)).toDF("id", "r")
    val b = Seq(("q", 1L), ("p", 2L)).toDF("id", "r")
    val out = RankFusion.rrf(Seq(a, b), "id", "r", 1)
      .select("id").as[String].collect()
    assert(out.toSeq == Seq("p"))
  }

  test("fewer than two rankings refuses") {
    val a = Seq(("x", 1L)).toDF("id", "r")
    intercept[IllegalArgumentException] {
      RankFusion.rrf(Seq(a), "id", "r", 5)
    }
  }
}
