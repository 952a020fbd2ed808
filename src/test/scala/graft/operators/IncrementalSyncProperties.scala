package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.DataFrame

import graft.TestSession

/** ScalaCheck laws for the incremental-sync merge composite — the
  * algebra a sync pipeline quietly relies on when retries, replays, and
  * out-of-order runs happen in production:
  *
  *  - mergeBatch is idempotent (replaying an increment is safe)
  *  - mergeBatch matches the per-key model (inc wins, dest survives)
  *  - exclusions commute with merge (apply-order can't change results)
  *  - applyExclusions is idempotent and model-exact
  *  - sync . sync == sync for the same source (a re-run is a no-op)
  *  - the strict-`>` watermark skips at-watermark rows; inclusive pulls
  *    them (the reference's documented bug-for-bug edge, pinned)
  *
  * Rows are (id, ts, v) with ids drawn from a small range so generated
  * destinations and increments collide on keys constantly — the regime
  * where merge bugs live.
  */
object IncrementalSyncProperties extends Properties("IncrementalSync") {

  private lazy val spark = TestSession.spark

  // each case runs several small Spark jobs; 15 cases keeps the suite
  // fast while still exercising heavy key collision
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private type R = (Long, Int, Int)
  private val rowGen: Gen[R] =
    Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 12), Gen.choose(0, 99))
  private val rowsGen = Gen.listOf(rowGen)
  private val rowsNonEmpty = Gen.nonEmptyListOf(rowGen)
  private val exGen = Gen.listOf(Gen.choose(0L, 15L))

  private def df(rows: List[R]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "ts", "v")
  }

  private def exDf(ids: List[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }

  /** Multiset view — merge laws are bag equalities, not set equalities. */
  private def bag(d: DataFrame): Map[R, Int] = {
    import spark.implicits._
    d.as[R].collect().toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
  }

  private def bagOf(rows: Seq[R]): Map[R, Int] =
    rows.groupBy(identity).map { case (k, v) => k -> v.size }

  property("mergeBatch is idempotent") = forAll(rowsGen, rowsGen) {
    (dest, inc) =>
      val once = IncrementalSync.mergeBatch(df(dest), df(inc), Seq("id"))
      val twice = IncrementalSync.mergeBatch(once, df(inc), Seq("id"))
      bag(twice) == bag(once)
  }

  property("mergeBatch matches the per-key model: inc replaces, dest survives") =
    forAll(rowsGen, rowsGen) { (dest, inc) =>
      val merged = bag(IncrementalSync.mergeBatch(df(dest), df(inc), Seq("id")))
      val incKeys = inc.map(_._1).toSet
      merged == bagOf(dest.filterNot(r => incKeys(r._1)) ++ inc)
    }

  property("exclusions commute with merge") =
    forAll(rowsGen, rowsGen, exGen) { (dest, inc, ex) =>
      val afterMerge = IncrementalSync.applyExclusions(
        IncrementalSync.mergeBatch(df(dest), df(inc), Seq("id")),
        exDf(ex), Seq("id"))
      val beforeMerge = IncrementalSync.mergeBatch(
        IncrementalSync.applyExclusions(df(dest), exDf(ex), Seq("id")),
        IncrementalSync.applyExclusions(df(inc), exDf(ex), Seq("id")),
        Seq("id"))
      bag(afterMerge) == bag(beforeMerge)
    }

  property("applyExclusions is idempotent and model-exact") =
    forAll(rowsGen, exGen) { (rows, ex) =>
      val exSet = ex.toSet
      val once = IncrementalSync.applyExclusions(df(rows), exDf(ex), Seq("id"))
      val twice = IncrementalSync.applyExclusions(once, exDf(ex), Seq("id"))
      val model = bagOf(rows.filterNot(r => exSet(r._1)))
      bag(once) == model && bag(twice) == model
    }

  property("sync twice with the same source equals sync once") =
    forAll(rowsNonEmpty, rowsGen) { (dest, source) =>
      val once = IncrementalSync.sync(df(source), df(dest), Seq("id"), "ts")
      val twice = IncrementalSync.sync(df(source), once, Seq("id"), "ts")
      bag(twice) == bag(once)
    }

  property("strict watermark skips at-watermark rows; inclusive pulls them") =
    forAll(rowsNonEmpty) { dest =>
      val wm = dest.map(_._2).max
      val src = df(List((99L, wm, 1)))
      IncrementalSync.increment(src, "ts", wm).count() == 0L &&
        IncrementalSync.increment(src, "ts", wm, inclusive = true).count() == 1L
    }
}
