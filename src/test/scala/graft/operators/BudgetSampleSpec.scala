package graft.operators

import graft.SparkSpec

class BudgetSampleSpec extends SparkSpec {
  import spark.implicits._

  private def mk(counts: Map[String, Int]) =
    counts.toSeq.flatMap { case (s, n) =>
      (1 to n).map(i => (s"$s-$i", s))
    }.toDF("id", "src")

  test("selects exactly the budget, proportionally by largest remainder") {
    // strata 60/30/10 rows, budget 10 -> exact quotas 6/3/1
    val df = mk(Map("a" -> 60, "b" -> 30, "c" -> 10))
    val out = Sampling.sampleBudget(df, "id", "src", 10L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 6L, "b" -> 3L, "c" -> 1L))
  }

  test("fractional quotas resolve by largest remainder, total exact") {
    // 7/7/7 rows, budget 10: floor(10*7/21)=3 each (9), remainders all
    // equal (10*7 mod 21 = 7) -> tie by stratum value: a gets the extra
    val df = mk(Map("a" -> 7, "b" -> 7, "c" -> 7))
    val out = Sampling.sampleBudget(df, "id", "src", 10L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    assert(out.values.sum == 10L)
  }

  test("selection is deterministic across partitionings") {
    val df = mk(Map("a" -> 40, "b" -> 25))
    val s1 = Sampling.sampleBudget(df, "id", "src", 13L)
      .select("id").as[String].collect().toSet
    val s2 = Sampling.sampleBudget(df.repartition(9), "id", "src", 13L)
      .select("id").as[String].collect().toSet
    assert(s1 == s2 && s1.size == 13)
  }

  test("a budget above the corpus keeps everything (quota caps at size)") {
    // proportional quotas only exceed a stratum's size when total > N;
    // the single-pass contract: keep all, undershoot the total
    val df = mk(Map("a" -> 10, "b" -> 1))
    val out = Sampling.sampleBudget(df, "id", "src", 15L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 10L, "b" -> 1L))
  }

  test("budget zero selects nothing; null strata are excluded") {
    val df = Seq(("x", Some("a")), ("y", None)).toDF("id", "src")
    assert(Sampling.sampleBudget(df, "id", "src", 0L).count() == 0)
    assert(Sampling.sampleBudget(df, "id", "src", 5L)
      .select("id").as[String].collect().toSeq == Seq("x"))
  }
}
