package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("every member of a cluster lands in the same split") {
    val d = (1L to 400L).map(i => (i, s"cluster${i % 37}")).toDF("id", "cl")
    val byCluster = Splits.assign(d, col("cl"), fracs)
      .groupBy($"cl").agg(countDistinct($"split").as("n"))
      .select(max($"n")).as[Long].head()
    assert(byCluster == 1L)
  }

  test("assignment is deterministic and stable under corpus growth") {
    val small = (1L to 100L).map(i => (i, s"k$i")).toDF("id", "k")
    val big = (1L to 1000L).map(i => (i, s"k$i")).toDF("id", "k")
    val a = Splits.assign(small, col("k"), fracs)
      .select($"k", $"split").as[(String, String)].collect().toMap
    val b = Splits.assign(big, col("k"), fracs)
      .select($"k", $"split").as[(String, String)].collect().toMap
    assert(a.forall { case (k, s) => b(k) == s })
  }

  test("fractions are respected approximately on many keys") {
    val d = (1L to 20000L).map(i => Tuple1(s"key$i")).toDF("k")
    val counts = Splits.assign(d, col("k"), fracs)
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.02)
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.02)
  }

  test("boundaries come from exact decimal, not IEEE products") {
    // 0.07 * 10000 in double is 699.9999…; decimal boundaries cut at
    // exactly 700
    assert(Splits.boundaries(Seq("a" -> 0.07, "b" -> 0.93), 10000) ==
      Seq(700L, 10000L))
    assert(Splits.boundaries(fracs, 10000) == Seq(8000L, 9000L, 10000L))
  }

  test("NULL keys get a NULL label, never the last split") {
    val d = Seq(Option("k1"), Option.empty[String]).toDF("k")
    val r = Splits.assign(d, col("k"), fracs)
      .select($"k", $"split").as[(Option[String], Option[String])]
      .collect().toMap
    assert(r(None).isEmpty && r(Some("k1")).nonEmpty)
  }

  test("a fraction below one bucket is rejected, not silently empty") {
    intercept[IllegalArgumentException] {
      Splits.label(col("k"), Seq("holdout" -> 0.00004, "train" -> 0.99996))
    }
  }

  test("invalid fraction sets are rejected") {
    intercept[IllegalArgumentException] {
      Splits.label(col("k"), Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Splits.label(col("k"), Seq("a" -> 0.5, "a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Splits.label(col("k"), Seq.empty)
    }
  }
}
