package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("rare repeated terms outrank ubiquitous ones") {
    val docs = Seq(
      (1L, "common common zebra zebra zebra"),
      (2L, "common common common other"),
      (3L, "common other other filler")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // 'zebra' is unique to doc 1 and repeated -> top term; 'common'
    // appears in every doc -> idf = ln(1) = 0, can never win
    assert(top(1L) == "zebra")
    assert(top(2L) != "common" && top(3L) != "common")
  }

  test("Skew.saltedSumCount equals direct aggregation on random data") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(_ =>
      (s"k${rnd.nextInt(3)}", rnd.nextDouble() * 100))
      .toDF("k", "v")
    val salted = Skew.saltedSumCount(df, Seq("k"), "v",
        saltSeed = monotonically_increasing_id(), buckets = 8)
      .select("k", "sum_v", "n").as[(String, java.math.BigDecimal, Long)]
      .collect().map { case (k, s, n) => k -> ((s, n)) }.toMap
    val direct = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("decimal(38,2)").as("s"),
        count(lit(1)).as("n"))
      .as[(String, java.math.BigDecimal, Long)].collect()
      .map { case (k, s, n) => k -> ((s, n)) }.toMap
    assert(salted == direct)
  }
}
