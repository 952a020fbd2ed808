package graft.operators

import graft.SparkSpec

class DecisionStumpSpec extends SparkSpec {
  import spark.implicits._

  test("a perfectly separating threshold is found with zero impurity") {
    // y = 1 iff x <= 2
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 0L), (4.0, 0L), (5.0, 0L))
      .toDF("x", "y")
    val r = DecisionStump.bestSplit(df, "x", "y").head()
    assert(r.getDouble(0) === 2.0) // threshold
    assert(r.getLong(1) === 5 && r.getLong(2) === 2)
    assert(r.getLong(3) === 2 && r.getLong(4) === 0)
    assert(math.abs(r.getDouble(5)) < 1e-9) // weighted gini 0
  }

  test("matches the hand-worked impurity for an imperfect split") {
    // x<=1: (2 pos, 0 neg); x>1: (1 pos, 3 neg)
    // weighted gini = (2/6)*0 + (4/6)*(1 - (1+9)/16) = (4/6)*(6/16)
    val df = Seq((1.0, 1L), (1.0, 1L), (2.0, 1L), (2.0, 0L),
      (3.0, 0L), (3.0, 0L)).toDF("x", "y")
    val r = DecisionStump.bestSplit(df, "x", "y").head()
    assert(r.getDouble(0) === 1.0)
    assert(math.abs(r.getDouble(5) - 4.0 / 6.0 * 6.0 / 16.0) < 1e-9)
  }

  test("constant label: any split scores equally, smallest wins") {
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 1L)).toDF("x", "y")
    val r = DecisionStump.bestSplit(df, "x", "y").head()
    assert(r.getDouble(0) === 1.0) // deterministic tie-break
    assert(math.abs(r.getDouble(5)) < 1e-9)
  }

  test("the full-range candidate (empty right side) is never chosen") {
    val df = Seq((1.0, 1L), (2.0, 0L)).toDF("x", "y")
    val out = DecisionStump.bestSplit(df, "x", "y")
      .select("threshold").as[Double].head()
    assert(out === 1.0) // x<=2 would leave nR = 0 — excluded
  }
}
