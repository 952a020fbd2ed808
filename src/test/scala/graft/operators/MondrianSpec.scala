package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MondrianSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5L

  private def corpus = {
    val rnd = new scala.util.Random(23)
    (1 to 200).map { i =>
      (i.toLong, rnd.nextInt(100).toDouble, rnd.nextInt(1000).toDouble)
    }.toDF("id", "age", "income")
  }

  test("every released class holds at least k rows and actually splits") {
    val out = Privacy.mondrian(corpus, Seq("age", "income"), K)
    val sizes = out.groupBy("pid").count().as[(Long, Long)].collect()
    assert(sizes.forall(_._2 >= K), s"under-k class: ${sizes.minBy(_._2)}")
    assert(sizes.length > 8, s"should partition a splittable corpus, " +
      s"got ${sizes.length} classes")
  }

  test("bands are valid: every row's value lies inside its class band") {
    val out = Privacy.mondrian(corpus, Seq("age", "income"), K)
    val bad = out.filter(
      col("age") < col("age_lo") || col("age") > col("age_hi") ||
        col("income") < col("income_lo") || col("income") > col("income_hi"))
    assert(bad.isEmpty)
    // and generalization actually narrows: some band is tighter than
    // the global range
    val tight = out.filter(col("age_hi") - col("age_lo") < lit(99.0))
    assert(!tight.isEmpty)
  }

  test("deterministic: identical pids and bands across runs") {
    def run() = Privacy.mondrian(corpus, Seq("age", "income"), K)
      .orderBy("id").collect().map(_.toSeq)
    assert(run().toSeq === run().toSeq)
  }

  test("a corpus under 2k rows never splits; null quasi rows are excluded") {
    val tiny = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("id", "age")
    val out = Privacy.mondrian(tiny, Seq("age"), K)
    assert(out.select("pid").distinct().count() === 1L)
    val withNull = tiny.union(Seq((9L, null.asInstanceOf[java.lang.Double]))
      .map(t => (t._1, Option(t._2).map(_.doubleValue).getOrElse(0.0)))
      .toDF("id", "age").withColumn("age",
        when(col("id") === 9L, lit(null)).otherwise(col("age"))))
    assert(Privacy.mondrian(withNull, Seq("age"), K).count() === 8L)
  }

  test("constant quasi column is a single unsplittable class") {
    val const = (1 to 30).map(i => (i.toLong, 7.0)).toDF("id", "age")
    val out = Privacy.mondrian(const, Seq("age"), K)
    assert(out.select("pid").distinct().count() === 1L)
    assert(out.select(min("age_lo"), max("age_hi"))
      .as[(Double, Double)].head() === ((7.0, 7.0)))
  }
}
