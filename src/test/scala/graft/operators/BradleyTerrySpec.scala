package graft.operators

import graft.SparkSpec

class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(String, String)], iters: Int) =
    BradleyTerry.fit(rows.toDF("w", "l"), "w", "l", iters)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("one MM round, hand-computed") {
    // A beats B twice, B beats A once, C beats B once.
    // wins: A=2 B=1 C=1; games: A=3 B=4 C=1; theta0 = 1:
    // den_A = 3/2, den_B = 3/2 + 1/2 = 2, den_C = 1/2
    // theta' = (4/3, 1/2, 2) -> maxnorm -> (2/3, 1/4, 1)
    val rows = Seq(("A", "B"), ("A", "B"), ("B", "A"), ("C", "B"))
    val out = fit(rows, 1)
    assert(out("A")._1 === 2L && out("A")._2 === 3L)
    assert(out("B")._1 === 1L && out("B")._2 === 4L)
    assert(out("C")._1 === 1L && out("C")._2 === 1L)
    assert(math.abs(out("A")._3 - 2.0 / 3.0) < 1e-9)
    assert(math.abs(out("B")._3 - 0.25) < 1e-9)
    assert(out("C")._3 === 1.0)
  }

  test("zero-win items land at theta 0 and never divide by zero") {
    val out = fit(Seq(("A", "B")), 2)
    assert(out("A")._3 === 1.0)
    assert(out("B") === ((0L, 1L, 0.0)))
  }

  test("strength ordering follows dominance on a transitive tournament") {
    // A beats everyone, B beats C/D, C beats D
    val rows = for {
      (w, ls) <- Seq("A" -> Seq("B", "C", "D"), "B" -> Seq("C", "D"),
        "C" -> Seq("D"))
      l <- ls; _ <- 1 to 3
    } yield (w, l)
    val out = fit(rows, 3)
    assert(out("A")._3 > out("B")._3)
    assert(out("B")._3 > out("C")._3)
    assert(out("C")._3 > out("D")._3)
    assert(out("D")._3 === 0.0) // zero wins
  }

  test("self-comparisons and nulls are dropped") {
    val rows = Seq((Some("A"), Some("A")), (Some("A"), Some("B")),
      (None, Some("B")), (Some("A"), None))
    val out = BradleyTerry.fit(rows.toDF("w", "l"), "w", "l", 1)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(out === Map("A" -> 1L, "B" -> 0L))
  }
}
