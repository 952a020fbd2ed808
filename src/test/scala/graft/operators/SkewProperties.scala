package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.TestSession

/** Model-based law for the skew operators: `saltedJoin`'s contract is
  * "semantically identical to the plain join", so the plain Spark join
  * IS the model — random fact/dim tables (hot keys, null keys, duplicate
  * dim keys, empty sides), random bucket counts, both join types, and
  * both seed choices (a non-null row id and the nullable key itself,
  * which exercises the null-seed -> bucket-0 fallback). */
object SkewProperties extends Properties("Skew") {

  private lazy val spark = TestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  // key 0 is hot (the regime salting exists for); ~1 in 6 keys null
  private val keyGen: Gen[Option[Long]] = Gen.frequency(
    5 -> Gen.const(Some(0L)),
    4 -> Gen.choose(1L, 4L).map(Some(_)),
    2 -> Gen.const(None))

  private val factGen: Gen[List[(Option[Long], Long)]] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, keyGen))
      .map(_.zipWithIndex.map { case (k, i) => (k, i.toLong) })

  private val dimGen: Gen[List[(Option[Long], String)]] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n,
      Gen.zip(keyGen, Gen.oneOf("red", "green", "blue"))))
      .map(_.map { case (k, p) => (k, p) })

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("k", "id", "payload").collect()
      .map(r => (Option(r.get(0)), r.getLong(1), Option(r.get(2))).toString)
      .toSeq.sorted

  property("saltedJoin equals the plain join") =
    forAll(factGen, dimGen, Gen.choose(1, 6),
        Gen.oneOf("inner", "left"), Gen.oneOf(true, false)) {
      (fact, dim, buckets, joinType, seedFromKey) =>
        import spark.implicits._
        val f = fact.toDF("k", "id")
        val d = dim.toDF("k", "payload")
        val seed = if (seedFromKey) col("k") else col("id")
        val got = rows(
          Skew.saltedJoin(f, d, Seq("k"), seed, buckets, joinType))
        val model = rows(f.join(d, Seq("k"), joinType))
        got == model
    }
}
