package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Privacy transform → audit composition: Mondrian generalization must
  * PASS the release audits that gate a real publication — the k floor
  * verified by the k-anonymity audit over the released bands, zero
  * rows at risk, and t-closeness computable over the generalized
  * classes. The transform and the audits each have their own specs;
  * this pins that the released schema feeds the audit chain unchanged.
  */
class PrivacyPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("mondrian output passes the k-anonymity audit it was built for") {
    val rnd = new scala.util.Random(31)
    val people = (1 to 500).map { i =>
      (i.toLong, rnd.nextInt(80).toDouble + 18.0,
        rnd.nextInt(200).toDouble * 500.0, s"d${rnd.nextInt(6)}")
    }.toDF("id", "age", "income", "diagnosis")

    val released = Privacy.mondrian(people, Seq("age", "income"), 10L)
      // the published quasi identifiers are the BANDS, not the values
      .select(col("id"), col("diagnosis"),
        col("age_lo"), col("age_hi"), col("income_lo"), col("income_hi"))

    val risk = Privacy.riskReport(released,
      Seq("age_lo", "age_hi", "income_lo", "income_hi"), kMin = 10L)
      .collect()(0)
    assert(risk.getAs[Long]("min_k") >= 10L,
      s"released bands must be >= k-anonymous: $risk")
    assert(risk.getAs[Long]("rows_at_risk") === 0L)
    assert(risk.getAs[Long]("n_rows") === 500L)

    // t-closeness computes over the generalized classes (the band pair
    // IS the quasi class) — every class's distance is a valid ppm
    val t = Privacy.tCloseness(released,
      Seq("age_lo", "age_hi", "income_lo", "income_hi"), "diagnosis",
      1000000L)
    val ts = t.select("t_ppm").as[Long].collect()
    assert(ts.nonEmpty && ts.forall(v => v >= 0L && v <= 1000000L))
  }
}
