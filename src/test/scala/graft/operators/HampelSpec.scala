package graft.operators

import graft.SparkSpec

class HampelSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Double*) =
    vals.zipWithIndex.map { case (v, i) =>
      ("u", i.toLong, i.toLong, v)
    }.toDF("k", "t", "id", "v")

  test("an isolated spike is flagged; steady neighbors are not") {
    val df = series(10.0, 10.2, 9.8, 100.0, 10.1, 9.9, 10.0, 10.2, 9.9)
    val out = Hampel.filter(df, "k", "t", "id", "v", halfWindow = 3)
      .orderBy("t").select("vm", "is_outlier")
      .as[(Long, Boolean)].collect()
    assert(out.count(_._2) === 1)
    assert(out.find(_._2).get._1 === 10000L) // the 100.00 row
  }

  test("a level shift is NOT flagged once the window recenters") {
    // two regimes; interior rows of each regime must stay clean
    val df = series(1.0, 1.0, 1.0, 1.0, 50.0, 50.0, 50.0, 50.0)
    val out = Hampel.filter(df, "k", "t", "id", "v", halfWindow = 1)
      .orderBy("t").select("is_outlier").as[Boolean].collect()
    assert(!out(1) && !out(6)) // interior of each regime
  }

  test("doubled median and quadrupled MAD are exact integers") {
    // frame [1,2,100] (halfWindow 1, middle row): med 2 → m2 = 4;
    // devs |2v−4| = [2,0,196] sorted [0,2,196] → mad4 = 2+2 = 4
    val df = series(0.01, 0.02, 1.00)
    val out = Hampel.filter(df, "k", "t", "id", "v", halfWindow = 1)
      .orderBy("t").select("m2", "mad4").as[(Long, Long)].collect()
    assert(out(1) === ((4L, 4L))) // micro units: 1,2,100
  }

  test("even frame size uses the mean of the two middles (doubled)") {
    // edge row sees frame [10, 20] → m2 = 30 (i.e. median 15)
    val df = series(0.10, 0.20, 0.20, 0.20)
    val out = Hampel.filter(df, "k", "t", "id", "v", halfWindow = 1)
      .orderBy("t").select("m2").as[Long].collect()
    assert(out(0) === 30L)
  }

  test("zero-MAD windows flag any deviation (classical Hampel edge)") {
    val df = series(5.0, 5.0, 5.0, 5.0, 5.01, 5.0, 5.0)
    val out = Hampel.filter(df, "k", "t", "id", "v", halfWindow = 3)
      .orderBy("t").select("is_outlier").as[Boolean].collect()
    assert(out(4)) // |dev| > 0 while threshold is exactly 0
    assert(out.count(identity) === 1)
  }
}
